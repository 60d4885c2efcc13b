package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Pq, Similarity}

/** Pins the product-quantization kernels and the IVF-PQ retrieval shape:
  * seed vectors must encode to their own codeword (zero distance), the
  * native ADC score must equal the query·reconstruction dot recomputed
  * with the same accumulation order, interpreted eval must match codegen,
  * degenerate inputs must go null (not throw), and the exhaustive setting
  * of ivfpqTopK must reproduce brute-force exact top-k bit for bit.
  */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"
  private val m = 4
  private val ks = 8

  private lazy val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val cb = Pq.seedCodebooks(vecs, "vec_id", "embedding", m, ks)

  test("codebook geometry: m subspaces, ks codewords, dim/m components") {
    assert(cb.size === m)
    assert(cb.forall(_.size === ks))
    val dim = vecs.select("embedding").head().getSeq[Float](0).size
    assert(cb.forall(_.forall(_.size === dim / m)))
  }

  test("seed vectors encode to their own codeword index in every subspace") {
    val codes = Pq.withCodes(vecs.where(col("vec_id") < ks), "embedding", cb)
      .select(col("vec_id"), col("pq_codes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Short](1).toSeq)
      .toMap
    assert(codes.size === ks)
    codes.foreach { case (id, cs) =>
      assert(cs === Seq.fill(m)(id.toShort),
        s"seed vector $id should be distance 0 from codeword $id everywhere")
    }
  }

  test("native ADC == query·reconstruction with the same accumulation order") {
    import graft.functions.PqCodes.{pqAdc, pqEncode, pqLut}
    val q = vecs.where(col("vec_id") === 3)
      .select(col("embedding")).head().getSeq[Float](0).toIndexedSeq
    val rows = vecs
      .select(
        col("vec_id"),
        pqEncode(col("embedding"), cb).as("codes"),
        pqAdc(
          pqEncode(col("embedding"), cb),
          pqLut(lit(null).cast("array<float>"), cb)).as("nullLut"))
      .collect()
    // recompute per row in Scala: per-subspace sequential dot of the
    // query slice against the chosen codeword, subspace sums added in
    // order — the kernel's documented arithmetic contract
    val sub = cb.head.head.size
    val expected = rows.map { r =>
      val codes = r.getSeq[Short](1)
      var tot = 0.0
      (0 until m).foreach { s =>
        var acc = 0.0
        val cw = cb(s)(codes(s).toInt)
        (0 until sub).foreach(j => acc += q(s * sub + j).toDouble * cw(j))
        tot += acc
      }
      r.getLong(0) -> tot
    }.toMap
    val got = vecs
      .select(
        col("vec_id"),
        graft.functions.PqCodes.pqAdc(
          pqEncode(col("embedding"), cb),
          pqLut(
            typedLit(q.toArray.toSeq).cast("array<float>"), cb)).as("adc"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) =>
      assert(v === expected(id), s"ADC for $id: $v != ${expected(id)}")
    }
    // null LUT → null score, never an exception
    assert(rows.forall(_.isNullAt(2)))
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val v = vecs.where(col("vec_id") === 5)
      .select("embedding").head().getSeq[Float](0).toArray
    val litVec = Literal(new GenericArrayData(v), ArrayType(FloatType))
    val enc = graft.functions.PqEncode(litVec, cb)
    val interp = enc.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toShortArray().toSeq
    val codegen = Pq.withCodes(vecs.where(col("vec_id") === 5), "embedding", cb)
      .select("pq_codes").head().getSeq[Short](0).toSeq
    assert(interp === codegen)
    val lutInterp = graft.functions.PqLut(litVec, cb)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq
    assert(lutInterp.size === m * ks)
  }

  test("degenerate inputs go null: wrong length, null elements, null vector") {
    import spark.implicits._
    import graft.functions.PqCodes.pqEncode
    val bad = Seq(
      (1L, Some(Seq(1.0f, 2.0f))), // wrong length
      (2L, None)                   // null vector
    ).toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val out = bad.select(col("id"), pqEncode(col("v"), cb).as("c")).collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("reconstruction error: ~0 for seed vectors, nonnegative-ish everywhere") {
    val errs = vecs
      .select(col("vec_id"), Pq.reconstructionError2(col("embedding"), cb).as("e"))
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    (0L until ks.toLong).foreach { id =>
      assert(math.abs(errs(id)) < 1e-6,
        s"seed vector $id should reconstruct exactly, err=${errs(id)}")
    }
    // the ADC-algebra spelling can dip epsilon-negative; never materially
    assert(errs.values.forall(_ > -1e-6))
    assert(errs.count { case (id, e) => id >= ks && e > 1e-3 } > 0,
      "non-seed vectors should carry real quantization error")
  }

  test("exhaustive ivfpqTopK == bruteForceTopK bit for bit") {
    val queries = vecs.where(col("vec_id") < 5)
    val n = vecs.count()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val pq = rows(Pq.ivfpqTopK(
      vecs, queries, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 4, m = m, ks = ks,
      poolFactor = (n / 3 + 1).toInt, kmeansIters = 0, pqIters = 0,
      corpusSize = Some(n)))
    assert(brute.nonEmpty)
    assert(pq === brute,
      s"only-brute=${brute -- pq} only-pq=${pq -- brute}")
  }

  test("exhaustive RESIDUAL ivfpqTopK == bruteForceTopK bit for bit") {
    val queries = vecs.where(col("vec_id") < 5)
    val n = vecs.count()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val brute = rows(Similarity.bruteForceTopK(
      vecs, queries, "vec_id", "embedding", k = 3))
    val pq = rows(Pq.ivfpqTopK(
      vecs, queries, "vec_id", "embedding", k = 3,
      nCentroids = 4, nProbe = 4, m = m, ks = ks,
      poolFactor = (n / 3 + 1).toInt, kmeansIters = 0, pqIters = 1,
      corpusSize = Some(n), residual = true))
    assert(pq === brute,
      s"only-brute=${brute -- pq} only-pq=${pq -- brute}")
  }

  test("residual codebooks quantize residuals tighter than raw codebooks quantize vectors") {
    import graft.functions.PqCodes.{pqAdc, pqEncodeResidual}
    // residual coding wins when the corpus is genuinely CLUSTERED (the
    // coarse quantizer then absorbs the between-cluster spread and PQ
    // only codes the small within-cluster offsets); on a uniform corpus
    // the residuals are as wide as the vectors and the claim is not a
    // theorem. Construct the clustered case deterministically: four
    // far-apart anchors, tiny per-id offsets.
    import spark.implicits._
    val dim = 64
    val clustered = (0L until 200L).map { id =>
      val a = (id % 4).toInt
      val v = Array.tabulate(dim) { j =>
        val anchor = if (j % 4 == a) 10.0f else 0.0f
        anchor + 0.01f * (((id * 31 + j * 7) % 11).toInt - 5)
      }
      (id, v)
    }.toDF("vec_id", "embedding")
    val n = 200L
    val centroids = Similarity.fitCentroids(
      clustered, "vec_id", "embedding", 4, 2, Some(n))
    val assigned = Similarity.assignToCentroids(
      clustered, "vec_id", "embedding", centroids)
    val rawCb = Pq.trainCodebooks(
      clustered, "vec_id", "embedding", m, ks, iters = 1, corpusSize = Some(n))
    val resCb = Pq.trainResidualCodebooks(
      assigned, centroids, m, ks, iters = 1, corpusSize = Some(n))
    // mean squared residual-reconstruction error via the ADC algebra:
    // ‖r − r̂‖² = r·r − 2·r·r̂ + ‖r̂‖², with r̂ looked up from the codes
    val cents = graft.ops.Pq.centDfF(spark, centroids)
    val joined = assigned.join(broadcast(cents), col("cluster") === col("dj_cc_cid"))
    val res = org.apache.spark.sql.functions.zip_with(
      col("vec"), col("dj_cc_cvec"), (x, y) => x - y)
    def meanOf(c: org.apache.spark.sql.Column): Double =
      joined.agg(avg(c)).head().getDouble(0)
    val norms: Seq[Double] = resCb.flatMap(_.map { cw =>
      var acc = 0.0; cw.foreach(v => acc += v * v); acc
    })
    import graft.functions.DotProductFloat.dotF
    val codes = pqEncodeResidual(col("vec"), col("dj_cc_cvec"), resCb)
    val rDotR = dotF(res, res)
    val lutOfRes = graft.functions.PqCodes.pqLut(res, resCb)
    val resErr = meanOf(
      rDotR - lit(2.0) * pqAdc(codes, lutOfRes) + pqAdc(codes, array(norms.map(lit): _*)))
    val rawErr = meanOf(Pq.reconstructionError2(col("vec"), rawCb))
    assert(resErr < rawErr,
      s"residual coding should beat raw coding at equal (m, ks): $resErr vs $rawErr")
  }

  test("trainCodebooks refinement keeps geometry and shrinks mean error") {
    val n = vecs.count()
    val seeded = Pq.trainCodebooks(
      vecs, "vec_id", "embedding", m, ks, iters = 0, corpusSize = Some(n))
    val refined = Pq.trainCodebooks(
      vecs, "vec_id", "embedding", m, ks, iters = 2, corpusSize = Some(n))
    assert(refined.size === m && refined.forall(_.size === seeded.head.size))
    def meanErr(codebooks: Seq[Seq[Seq[Double]]]): Double = {
      val d = vecs.select(
        avg(Pq.reconstructionError2(col("embedding"), codebooks))).head()
      d.getDouble(0)
    }
    val e0 = meanErr(seeded)
    val e2 = meanErr(refined)
    assert(e2 <= e0 * 1.0001,
      s"Lloyd refinement should not increase mean reconstruction error: $e0 -> $e2")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016 — the
  * tokenizer-training step of an LLM data pipeline), distributed:
  *
  *   - the corpus folds ONCE into a (word, weight) table — every later
  *     round works on the distinct-word table, whose size tracks the
  *     VOCABULARY, not the corpus (the classic trick that makes BPE
  *     training tractable at 100 TB: a trillion tokens collapse to a few
  *     million distinct words);
  *   - each round is one pair-count aggregate (explode adjacent symbol
  *     pairs, sum weights — partial-aggregated) + a 1-row argmax collect
  *     (count desc, pair asc — fully tie-broken, so training is
  *     deterministic) + a greedy left-to-right merge applied as a
  *     higher-order-function fold (codegen'd, zero shuffle);
  *   - the word table is checkpointed per round through [[graft.core.Blocks]]
  *     (the connected-components precedent), so round k's plan never
  *     re-derives rounds 1..k-1.
  */
object Bpe {

  /** (word, weight) → (symbols array, weight): initial per-character
    * symbol split. Empty words are dropped.
    */
  def toSymbols(words: DataFrame, wordCol: String, weightCol: String): DataFrame =
    words
      .where(col(wordCol).isNotNull && col(wordCol) =!= "")
      .select(split(col(wordCol), "").as("symbols"), col(weightCol).as("weight"))

  /** Weighted adjacent-pair counts of the current symbolization: one
    * explode + one partial-agg sum. The whole round's shuffle is bounded
    * by the number of DISTINCT PAIRS, not words.
    */
  def pairCounts(symbolized: DataFrame): DataFrame =
    symbolized
      .where(size(col("symbols")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(0, size(symbols) - 2), " +
            "i -> struct(symbols[i] AS a, symbols[i + 1] AS b))")).as("p"),
        col("weight"))
      .groupBy(col("p.a").as("left_sym"), col("p.b").as("right_sym"))
      .agg(sum(col("weight")).as("pair_count"))

  /** Greedy left-to-right, non-overlapping application of one merge
    * (a, b) → ab: a pure HOF fold over each symbol array — `aaa` under
    * (a,a) becomes `[aa, a]`, exactly the reference algorithm's behavior.
    */
  def applyMerge(symbolized: DataFrame, a: String, b: String): DataFrame = {
    val merged = a + b
    val fold = aggregate(
      col("symbols"),
      struct(
        array().cast("array<string>").as("out"),
        lit(null).cast("string").as("prev")),
      (acc, cur) =>
        when(
          acc.getField("prev") === a && cur === b,
          struct(
            concat(acc.getField("out"), array(lit(merged))).as("out"),
            lit(null).cast("string").as("prev")))
          .when(
            acc.getField("prev").isNotNull,
            struct(
              concat(acc.getField("out"), array(acc.getField("prev"))).as("out"),
              cur.as("prev")))
          .otherwise(
            struct(acc.getField("out").as("out"), cur.as("prev"))),
      acc =>
        when(
          acc.getField("prev").isNotNull,
          concat(acc.getField("out"), array(acc.getField("prev"))))
          .otherwise(acc.getField("out")))
    symbolized.withColumn("symbols", fold)
  }

  /** Apply an ORDERED merge list to tokenize documents — the encode side
    * (Sennrich's `apply_bpe`: each learned merge applied everywhere, in
    * learned order). Per document: whitespace words explode with their
    * position, each word's character symbols run through the merge chain
    * (k stacked HOF folds — one projection, zero shuffles; keep k modest,
    * the plan nests one lambda per merge), and the pieces re-gather in
    * word order. Output: (`idCol`, `pieces` array, `n_pieces`).
    */
  def encode(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = df
      .where(col(textCol).isNotNull)
      .select(
        col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("dj_pos", "dj_w")))
      .where(col("dj_w") =!= "")
      .withColumn("symbols", split(col("dj_w"), ""))
    val merged = merges.foldLeft(words) {
      case (d, (a, b)) => applyMerge(d, a, b)
    }
    merged
      .groupBy(idCol)
      .agg(
        flatten(
          transform(
            array_sort(collect_list(struct(col("dj_pos"), col("symbols")))),
            s => s.getField("symbols"))).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")))
  }

  /** Train `nMerges` BPE merges over `textCol` (whitespace-tokenized via
    * [[TextAnalysis.tokens]]): returns the ordered merge list and the
    * final (symbols, weight) table. Stops early when the best pair drops
    * below `minPairCount`. Each round's driver traffic is ONE row.
    */
  def train(
      df: DataFrame,
      textCol: String,
      nMerges: Int,
      minPairCount: Long = 2L): (Seq[(String, String)], DataFrame) = {
    require(nMerges >= 0, s"nMerges must be non-negative: $nMerges")
    val words = df
      .where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("weight"))
    var current = graft.core.Blocks.checkpoint(toSymbols(words, "w", "weight"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < nMerges) {
      val top = pairCounts(current)
        .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
        .limit(1)
        .collect()
      top.headOption match {
        case Some(r) if r.getLong(2) >= minPairCount =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          // checkpoint: round k's fold must not re-evaluate rounds 1..k-1;
          // the superseded round's blocks are dead the moment the new
          // checkpoint materializes — release them here instead of letting
          // up to nMerges word tables pile up until the caller's releaseAll
          val prev = current
          current = graft.core.Blocks.checkpoint(applyMerge(current, a, b))
          graft.core.Blocks.release(prev)
        case _ => continue = false
      }
      round += 1
    }
    (merges.toSeq, current)
  }
}

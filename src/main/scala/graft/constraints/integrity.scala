package graft.constraints

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.DataRef
import graft.ops.Integrity

/** Beyond-reference constraint family: relational integrity checks
  * (foreign-key orphans, within-key monotonicity, z-score outliers) built
  * on [[graft.ops.Integrity]], declared through the same requirement DSL
  * as every reference constraint.
  */

/** Referential-integrity budget (between-table): the fraction of first-
  * table rows whose key tuple has no match in the second table must stay ≤
  * the target (0 = a strict foreign key). NULL child keys follow SQL MATCH
  * SIMPLE: exempt, not orphaned. One anti hash join + one count pair.
  */
final case class MaxOrphanFraction(
    ref: DataRef,
    ref2Required: DataRef,
    childColumns: Seq[String],
    parentColumns: Seq[String],
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_orphan_fraction must lie within [0, 1] but is $refValue.")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val row = Integrity
      .orphanStats(
        ref.selection(spark), ref2Required.selection(spark),
        childColumns, parentColumns)
      .head()
    val total = row.getLong(0)
    val factual =
      if (total == 0L) 0.0 else row.getLong(1).toDouble / total
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of ${ref.describe} rows reference no " +
          s"${ref2Required.describe} row on (${childColumns.mkString(", ")}) " +
          s"while only $target were allowed to.")
  }
}

/** Key-overlap budget (between-table) — the inverse of
  * [[MaxOrphanFraction]]: at most `refValue` of first-table rows may have
  * a key tuple that ALSO appears in the second table. With a normalized
  * URL or content fingerprint as the key this is train/eval
  * decontamination at the exact-key level (the n-gram and MinHash flavors
  * live in `ops.Corpus`/`ops.Dedup`). LEFT SEMI hash join + count pair.
  */
final case class MaxKeyOverlapFraction(
    ref: DataRef,
    ref2Required: DataRef,
    columns1: Seq[String],
    columns2: Seq[String],
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_key_overlap_fraction must lie within [0, 1] but is $refValue.")
  require(columns1.nonEmpty && columns1.size == columns2.size,
    "columns1 and columns2 must be non-empty and of equal length")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val left = ref.selection(spark)
      .where(columns1.map(col(_).isNotNull).reduce(_ && _))
    val total = left.count()
    val rightKeys = ref2Required.selection(spark)
      .select(columns2.zip(columns1).map { case (c2, c1) => col(c2).as(s"dj_k_$c1") }: _*)
      .distinct()
    val cond = columns1.map(c => col(c) === col(s"dj_k_$c")).reduce(_ && _)
    val overlapping = left.join(rightKeys, cond, "left_semi").count()
    val factual = if (total == 0L) 0.0 else overlapping.toDouble / total
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of ${ref.describe} rows share their " +
          s"(${columns1.mkString(", ")}) key with ${ref2Required.describe} " +
          s"while only $target were allowed to (contamination).")
  }
}

/** Malformed-JSON budget: at most `refValue` of a JSON string column's
  * non-null documents may fail to parse against the declared DDL schema —
  * the ingestion-feed corruption / schema-drift alarm.
  */
final case class MaxMalformedJsonFraction(
    ref: DataRef,
    column: String,
    schemaDdl: String,
    refValue: Option[Double],
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends ValueConstraint[Double] {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_malformed_fraction must lie within [0, 1] but is $refValue.")

  override protected def retrieve(spark: SparkSession, r: DataRef): Double =
    graft.ops.SemiStructured.malformedFraction(r.selection(spark), column, schemaDdl)

  override protected def compare(factual: Double, target: Double): (Boolean, Option[String]) =
    (factual <= target,
      Some(s"$factual of ${ref.describe}.$column documents fail to parse " +
        s"as `$schemaDdl` while only $targetPrefix$target were allowed to."))
}

/** PSI drift budget (between-table): the Population Stability Index of
  * `column` between the two snapshots, over explicit equi-width buckets,
  * must stay ≤ the target (industry rule of thumb: 0.1 watch, 0.25 act).
  */
final case class MaxPsiDrift(
    ref: DataRef,
    ref2Required: DataRef,
    column: String,
    lo: Double,
    hi: Double,
    nBuckets: Int,
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(refValue.exists(_ >= 0), s"max_psi must be non-negative: $refValue")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val factual = graft.ops.Drift
      .psi(ref.selection(spark), ref2Required.selection(spark),
        column, lo, hi, nBuckets)
      .head().getDouble(2)
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"PSI of $column between ${ref.describe} and " +
          s"${ref2Required.describe} is $factual while at most $target was " +
          "allowed (distribution drift).")
  }
}

/** Chi-square homogeneity drift (between-table): the two snapshots'
  * category distributions of `column` must not differ at the given
  * significance level — fails when the upper-tail p-value of the
  * statistic (dof = categories − 1) drops below `significanceLevel`.
  */
final case class ChiSquareDrift(
    ref: DataRef,
    ref2Required: DataRef,
    column: String,
    significanceLevel: Double,
    refValue: Option[Double] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    significanceLevel > 0 && significanceLevel <= 1,
    s"significance level must lie in (0, 1]: $significanceLevel")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val rOpt = graft.ops.Drift
      .chiSquareDrift(ref.selection(spark), ref2Required.selection(spark), column)
      .head(1)
      .headOption
    rOpt match {
      // both snapshots empty: the contingency table has no cells at all
      case None => graft.core.TestResult.success(description)
      case Some(r) =>
        val na = if (r.isNullAt(0)) 0L else r.getLong(0)
        val nb = if (r.isNullAt(1)) 0L else r.getLong(1)
        val k = r.getInt(2)
        // an EMPTY snapshot carries no distribution to compare — the
        // statistic's expectations divide by a zero row total (chi2 would
        // be NaN), so the test is vacuous rather than failed-with-NaN
        if (na == 0L || nb == 0L || k <= 1)
          graft.core.TestResult.success(description)
        else {
          val p = graft.ops.Drift.chiSquarePValue(r.getDouble(3), k - 1)
          if (p >= significanceLevel) graft.core.TestResult.success(description)
          else
            graft.core.TestResult.failure(
              description,
              s"the $column category distributions of ${ref.describe} and " +
                s"${ref2Required.describe} differ (chi2=${r.getDouble(3)}, " +
                s"dof=${k - 1}, p=$p < $significanceLevel).")
        }
    }
  }
}

/** Wasserstein-1 drift budget (between-table): the earth-mover distance
  * of `column` between the two snapshots — in the column's OWN units, via
  * `scale` fixed-point digits — must stay ≤ the target. The
  * histogram-free companion of [[MaxPsiDrift]]: no bucket choices, and a
  * small shift everywhere registers as exactly its mean displacement.
  * Vacuous when either snapshot has no non-NULL values (the distance to
  * an empty distribution is undefined).
  */
final case class MaxWassersteinDrift(
    ref: DataRef,
    ref2Required: DataRef,
    column: String,
    scale: Long,
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(refValue.exists(_ >= 0), s"max_w1 must be non-negative: $refValue")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val r = graft.ops.Drift
      .wasserstein1(ref.selection(spark), ref2Required.selection(spark),
        column, scale)
      .head()
    if (r.isNullAt(2)) graft.core.TestResult.success(description)
    else {
      val factual = r.getDouble(2)
      val target = refValue.get
      if (factual <= target) graft.core.TestResult.success(description)
      else
        graft.core.TestResult.failure(
          description,
          s"Wasserstein-1 distance of $column between ${ref.describe} and " +
            s"${ref2Required.describe} is $factual while at most $target " +
            "was allowed (distribution drift).")
    }
  }
}

/** Cramér–von Mises drift budget (between-table): the two-sample CvM
  * statistic of `column` — the L² integral of the CDF gap, which
  * registers broad small drifts the KS maximum misses — must stay ≤ the
  * target. Vacuous when either snapshot has no non-NULL values.
  */
final case class MaxCvmDrift(
    ref: DataRef,
    ref2Required: DataRef,
    column: String,
    scale: Long,
    refValue: Option[Double],
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(refValue.exists(_ >= 0), s"max_cvm must be non-negative: $refValue")

  override protected def ref2Option: Option[DataRef] = Some(ref2Required)

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val r = graft.ops.Stats
      .cvm2Sample(ref.selection(spark), ref2Required.selection(spark),
        column, scale)
      .head()
    if (r.isNullAt(2)) graft.core.TestResult.success(description)
    else {
      val factual = r.getDouble(2)
      val target = refValue.get
      if (factual <= target) graft.core.TestResult.success(description)
      else
        graft.core.TestResult.failure(
          description,
          s"Cramér–von Mises statistic of $column between ${ref.describe} " +
            s"and ${ref2Required.describe} is $factual while at most " +
            s"$target was allowed (distribution drift).")
    }
  }
}

/** Mutual-information budget (within-table): MI(`xColumn`; `yColumn`) in
  * nats must stay ≤ the target — the feature-leakage alarm ("this
  * feature encodes the label", "this metadata column determines the
  * split") that the exact functional-dependency check only catches at
  * its deterministic extreme. Vacuous on an empty table.
  */
final case class MaxMutualInformation(
    ref: DataRef,
    xColumn: String,
    yColumn: String,
    refValue: Option[Double],
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(refValue.exists(_ >= 0), s"max_mi must be non-negative: $refValue")

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    graft.ops.Drift
      .mutualInformation(ref.selection(spark), xColumn, yColumn)
      .head(1)
      .headOption match {
      case None => graft.core.TestResult.success(description)
      case Some(r) =>
        val factual = r.getDouble(3)
        val target = refValue.get
        if (factual <= target) graft.core.TestResult.success(description)
        else
          graft.core.TestResult.failure(
            description,
            s"mutual information between $xColumn and $yColumn of " +
              s"${ref.describe} is $factual nats while at most $target was " +
              "allowed (column dependence / leakage).")
    }
  }
}

/** Within-key monotonicity: `valueColumn` must never decrease (strictly
  * increase when `strict`) along `orderColumn` within each `keyColumn`
  * group — "timestamps must not run backwards per session". At most
  * `refValue` (fraction of adjacent pairs) may violate; 0 = strictly
  * monotone data. One per-key window.
  */
final case class MaxMonotonicityViolationFraction(
    ref: DataRef,
    keyColumn: String,
    orderColumn: String,
    valueColumn: String,
    strict: Boolean,
    refValue: Option[Double],
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_violation_fraction must lie within [0, 1] but is $refValue.")

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val row = Integrity
      .monotonicityViolations(
        ref.selection(spark), keyColumn, orderColumn, valueColumn, strict)
      .agg(
        coalesce(sum(col("n_pairs")), lit(0L)).as("pairs"),
        coalesce(sum(col("n_violations")), lit(0L)).as("bad"))
      .head()
    val pairs = row.getLong(0)
    val factual = if (pairs == 0L) 0.0 else row.getLong(1).toDouble / pairs
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of adjacent $valueColumn pairs (per $keyColumn, ordered " +
          s"by $orderColumn) in ${ref.describe} decrease while only $target " +
          "were allowed to.")
  }
}

/** Outlier budget: at most `refValue` of rows may sit more than `k`
  * standard deviations from the column mean. The comparison runs in exact
  * integer-decimal arithmetic ([[Integrity.zOutliers]]), so the verdict is
  * engine- and partitioning-independent.
  */
final case class MaxOutlierFraction(
    ref: DataRef,
    column: String,
    k: Int,
    scale: Long,
    refValue: Option[Double],
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_outlier_fraction must lie within [0, 1] but is $refValue.")

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val row = Integrity
      .zOutliers(ref.selection(spark), column, k, scale)
      .agg(
        count(lit(1)).as("n"),
        count(when(col("is_outlier"), 1)).as("out"))
      .head()
    val total = row.getLong(0)
    val factual = if (total == 0L) 0.0 else row.getLong(1).toDouble / total
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of ${ref.describe}.$column values lie more than $k " +
          s"standard deviations from the mean while only $target were " +
          "allowed to.")
  }
}

/** Robust outlier budget: at most `refValue` of rows may deviate more
  * than `k` robust sigmas (`k · 1.4826 · MAD`) from the column MEDIAN
  * ([[Integrity.madOutliers]] — exact doubled-order-statistic medians,
  * integer comparisons). Unlike [[MaxOutlierFraction]]'s z-scores, heavy
  * contamination cannot mask itself by inflating the spread estimate.
  */
final case class MaxRobustOutlierFraction(
    ref: DataRef,
    column: String,
    k: Double,
    scale: Long,
    refValue: Option[Double],
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_robust_outlier_fraction must lie within [0, 1] but is $refValue.")

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
   graft.core.Blocks.scoped {
    val row = Integrity
      .madOutliers(ref.selection(spark), column, k, scale)
      .agg(
        count(lit(1)).as("n"),
        count(when(col("is_outlier"), 1)).as("out"))
      .head()
    val total = row.getLong(0)
    val factual = if (total == 0L) 0.0 else row.getLong(1).toDouble / total
    val target = refValue.get
    if (factual <= target) graft.core.TestResult.success(description)
    else
      graft.core.TestResult.failure(
        description,
        s"$factual of ${ref.describe}.$column values lie more than $k " +
          s"robust sigmas (MAD) from the median while only $target were " +
          "allowed to.")
   }
  }
}

/** Benford conformity ceiling: the mean absolute deviation (MAD, Nigrini's
  * conformity metric) of the first-significant-digit distribution from
  * Benford's law must stay ≤ the target
  * ([[graft.ops.Integrity.benfordProfile]]) — the fabricated/corrupted-
  * numbers alarm for naturally multi-magnitude columns (amounts, counts,
  * populations). Nigrini's bands: ≤ 0.006 close, ≤ 0.012 acceptable,
  * ≤ 0.015 marginal. Vacuous when no eligible (|v| ≥ 1) values exist.
  */
final case class MaxBenfordDeviation(
    ref: DataRef,
    valueColumn: String,
    refValue: Option[Double] = None,
    ref2: Option[DataRef] = None,
    override val nameOverride: Option[String] = None)
    extends Constraint {
  require(
    refValue.exists(v => v >= 0 && v <= 1),
    s"max_benford_deviation must lie within [0, 1] but is $refValue.")

  override def test(spark: SparkSession): graft.core.TestResult = withPlans {
    val target = refValue.get
    val rows = graft.ops.Integrity
      .benfordProfile(ref.selection(spark), valueColumn)
      .collect() // exactly nine rows by construction
    if (rows.isEmpty || rows.head.isNullAt(2))
      graft.core.TestResult.success(description) // no eligible values
    else {
      val mad = rows.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).sum / 9.0
      if (mad <= target) graft.core.TestResult.success(description)
      else {
        val worst = rows.maxBy(r => math.abs(r.getDouble(2) - r.getDouble(3)))
        graft.core.TestResult.failure(
          description,
          s"First-digit distribution of $valueColumn on ${ref.describe} " +
            s"deviates from Benford's law: MAD=$mad (max $target); worst " +
            s"digit ${worst.getInt(0)} observed ${worst.getDouble(2)} vs " +
            s"expected ${worst.getDouble(3)}.")
      }
    }
  }
}

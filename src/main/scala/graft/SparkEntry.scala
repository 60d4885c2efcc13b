package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Condition, DataRef, FrameSource, ParquetSource}
import graft.ops.{Intervals, Ops, Stats}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator of SURVEY §2.1 has a `queries` entry here, each paired with
  * a DuckDB-executable oracle in `oracleSql` (column names aligned on both
  * sides; integer outputs cast to BIGINT, fragile doubles rounded identically
  * in-plan).
  */
object SparkEntry {

  private def pq(dir: String, name: String): String = s"$dir/$name.parquet"

  private def ref(
      dir: String,
      table: String,
      cols: Option[Seq[String]] = None,
      cond: Option[String] = None): DataRef =
    DataRef(ParquetSource(pq(dir, table)), cols, cond.map(Condition.raw))

  private def one(s: SparkSession, names: Seq[String], values: Seq[Any]): DataFrame = {
    val row = org.apache.spark.sql.Row(values: _*)
    val fields = names.zip(values).map {
      case (n, _: java.lang.Long)    => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType)
      case (n, _: java.lang.Double)  => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)
      case (n, _: String)            => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)
      case (n, _)                    => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)
    }
    s.createDataFrame(
      java.util.Collections.singletonList(row),
      org.apache.spark.sql.types.StructType(fields))
  }

  /** Format a collected temporal value as an ISO local date, regardless of
    * whether Spark handed back a legacy or java.time object (TIMESTAMP vs
    * TIMESTAMP_NTZ collect types differ in Spark 4).
    */
  private def dateStr(v: Any): String = v match {
    case t: java.sql.Timestamp =>
      t.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDate.toString
    case ldt: java.time.LocalDateTime => ldt.toLocalDate.toString
    case i: java.time.Instant => i.atOffset(java.time.ZoneOffset.UTC).toLocalDate.toString
    case d: java.sql.Date             => d.toString
    case ld: java.time.LocalDate      => ld.toString
    case other                        => String.valueOf(other)
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. TPC-H Q1-shaped
    * pricing summary — one shuffle, map-side partial aggregation.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    spark.read
      .parquet(pq(dir, "lineitem"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice").cast(DecimalType(38, 6))), 2)
          .cast("double")
          .as("sum_price"),
        count(lit(1)).as("n_rows"))
  }

  // ---------------------------------------------------------------------
  // One query per implemented operator from SURVEY.md §2.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // #1 get_selection: scan + filter + projection
    "q_selection" -> ((s, dir) =>
      ref(
        dir,
        "lineitem",
        Some(Seq("l_orderkey", "l_linenumber", "l_quantity")),
        Some("l_returnflag = 'R' AND l_quantity > 45")).selection(s)),

    // #13 get_row_count
    "q_row_count" -> { (s, dir) =>
      val n = Ops.rowCount(s, ref(dir, "lineitem", cond = Some("l_discount > 0.05")))
      one(s, Seq("n_rows"), Seq(Long.box(n)))
    },

    // #13 get_row_count with row_limit cap (NRowsMin optimization)
    "q_row_count_capped" -> { (s, dir) =>
      val n = Ops.rowCount(s, ref(dir, "lineitem"), rowLimit = Some(1234L))
      one(s, Seq("n_rows"), Seq(Long.box(n)))
    },

    // #15 get_min / get_max (numeric and date)
    "q_min_max" -> { (s, dir) =>
      val r  = ref(dir, "lineitem", Some(Seq("l_extendedprice")))
      val rd = ref(dir, "lineitem", Some(Seq("l_shipdate")))
      val minP = Ops.getMin(s, r).asInstanceOf[Double]
      val maxP = Ops.getMax(s, r).asInstanceOf[Double]
      val minD = Ops.getMin(s, rd.copy(columns = Some(Seq("l_shipdate"))))
      val maxD = Ops.getMax(s, rd)
      one(
        s,
        Seq("min_price", "max_price", "min_ship", "max_ship"),
        Seq(Double.box(minP), Double.box(maxP), dateStr(minD), dateStr(maxD)))
    },

    // #16 get_mean (avg over exact-integer doubles + decimal-cast avg)
    "q_mean" -> { (s, dir) =>
      val avgQty = Ops.getMean(s, ref(dir, "lineitem", Some(Seq("l_quantity"))))
      val avgPrice = Ops.getMean(s, ref(dir, "lineitem", Some(Seq("l_extendedprice"))))
      one(
        s,
        Seq("avg_qty", "avg_price"),
        Seq(Double.box(round6(avgQty)), Double.box(round6(avgPrice))))
    },

    // #17 get_percentile — exact semantics, three percentages in one pass
    "q_percentile" -> { (s, dir) =>
      val counts = s.read
        .parquet(pq(dir, "lineitem"))
        .where(col("l_extendedprice").isNotNull)
        .groupBy(col("l_extendedprice").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val wCum =
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      counts
        .select(
          col("v"),
          sum(col("cnt")).over(wCum).as("cum"),
          sum(col("cnt")).over(wAll).as("total"))
        .agg(
          min(when(col("cum") * 100 >= col("total") * 25, col("v"))).as("p25"),
          min(when(col("cum") * 100 >= col("total") * 50, col("v"))).as("p50"),
          min(when(col("cum") * 100 >= col("total") * 90, col("v"))).as("p90"))
    },

    // #18 get_min_length / get_max_length
    "q_min_max_length" -> { (s, dir) =>
      val r = ref(dir, "part", Some(Seq("p_name")))
      one(
        s,
        Seq("min_len", "max_len"),
        Seq(Long.box(Ops.getMinLength(s, r)), Long.box(Ops.getMaxLength(s, r))))
    },

    // #19 get_fraction_between
    "q_fraction_between" -> { (s, dir) =>
      val f = Ops
        .getFractionBetween(s, ref(dir, "lineitem", Some(Seq("l_quantity"))), "10", "40")
        .getOrElse(0.0)
      one(s, Seq("frac"), Seq(Double.box(round6(f))))
    },

    // #20 get_uniques: GROUP BY + count
    "q_uniques" -> ((s, dir) =>
      ref(dir, "lineitem")
        .selection(s)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))),

    // #21 get_unique_count
    "q_unique_count" -> { (s, dir) =>
      val n =
        Ops.getUniqueCount(s, ref(dir, "lineitem", Some(Seq("l_orderkey", "l_suppkey"))))
      one(s, Seq("n_unique"), Seq(Long.box(n)))
    },

    // #22 get_unique_count_union
    "q_unique_count_union" -> { (s, dir) =>
      val n = Ops.getUniqueCountUnion(
        s,
        ref(dir, "customer", Some(Seq("c_nationkey"))),
        ref(dir, "supplier", Some(Seq("s_nationkey"))))
      one(s, Seq("n_unique"), Seq(Long.box(n)))
    },

    // #23 get_missing_fraction (NULLs synthesized via nullif)
    "q_missing_fraction" -> { (s, dir) =>
      val frame = s.read
        .parquet(pq(dir, "orders"))
        .select(expr("nullif(o_orderpriority, '1-URGENT')").as("x"))
      val f = Ops
        .getMissingFraction(s, DataRef(FrameSource(frame, "orders_nullif"), Some(Seq("x"))))
        .getOrElse(0.0)
      one(s, Seq("null_frac"), Seq(Double.box(round6(f))))
    },

    // #24 get_column_names (reflected schema)
    "q_column_names" -> { (s, dir) =>
      val names = Ops.getColumnNames(s, ref(dir, "customer")).sorted
      s.createDataFrame(
        names.map(n => org.apache.spark.sql.Row(n)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            "column_name",
            org.apache.spark.sql.types.StringType))))
    },

    // #25 get_column_type (reflected type of the relevant column)
    "q_column_type" -> { (s, dir) =>
      val tpe = Ops.getColumnType(s, ref(dir, "customer", Some(Seq("c_custkey"))))
      one(s, Seq("col_type"), Seq(tpe.simpleString))
    },

    // #27/#28 get_row_difference (EXCEPT = EXCEPT DISTINCT)
    "q_row_diff" -> ((s, dir) =>
      ref(
        dir,
        "orders",
        Some(Seq("o_orderkey", "o_orderstatus")),
        Some("o_totalprice > 50000")).selection(s).except(
        ref(dir, "orders", Some(Seq("o_orderkey", "o_orderstatus")), Some("o_orderstatus = 'F'"))
          .selection(s))),
    "q_row_diff_count" -> { (s, dir) =>
      val n = Ops.getRowDifferenceCount(
        s,
        ref(dir, "orders", Some(Seq("o_orderkey", "o_orderstatus")), Some("o_totalprice > 50000")),
        ref(dir, "orders", Some(Seq("o_orderkey", "o_orderstatus")), Some("o_orderstatus = 'F'")))
      one(s, Seq("n_diff"), Seq(Long.box(n)))
    },

    // #29 get_row_mismatch (inner match-join + null-safe compare)
    "q_row_mismatch" -> { (s, dir) =>
      val r1 = ref(dir, "orders", Some(Seq("o_orderkey", "o_orderpriority")))
      val modified = s.read
        .parquet(pq(dir, "orders"))
        .select(col("o_orderkey"), expr("nullif(o_orderpriority, '2-HIGH')").as("p2"))
      val r2 = DataRef(FrameSource(modified, "orders_mod"), Some(Seq("o_orderkey", "p2")))
      val (mismatch, n) = Ops.getRowMismatch(
        s,
        r1,
        r2,
        Ops.MatchAndCompare(
          Seq("o_orderkey"),
          Seq("o_orderkey"),
          Seq("o_orderpriority"),
          Seq("p2")))
      one(
        s,
        Seq("mismatch_frac", "n_rows"),
        Seq(Double.box(round6(mismatch)), Long.box(n)))
    },

    // #30 duplicates
    "q_duplicates" -> ((s, dir) =>
      Ops.duplicates(ref(dir, "lineitem", Some(Seq("l_orderkey"))).selection(s))),

    // #12 get_functional_dependency_violations
    "q_functional_dependency" -> ((s, dir) =>
      Ops.functionalDependencyViolations(
        s,
        ref(dir, "orders", Some(Seq("o_custkey", "o_orderstatus"))),
        Seq("o_custkey"))),

    // #32 column_array_agg (collect_list, order-normalized)
    "q_array_agg" -> ((s, dir) =>
      Ops
        .columnArrayAgg(s, ref(dir, "nation", Some(Seq("n_regionkey"))), "n_name")
        .select(
          col("n_regionkey"),
          array_join(col("n_name"), ",").as("names"))),

    // #5 get_date_span
    "q_date_span" -> { (s, dir) =>
      val frame =
        s.read.parquet(pq(dir, "orders")).select(to_date(col("o_orderdate")).as("d"))
      val span =
        Ops.getDateSpan(s, DataRef(FrameSource(frame, "orders_dates"), Some(Seq("d"))))
      one(s, Seq("span_days"), Seq(Long.box(span.toLong)))
    },

    // #7 get_interval_overlaps_nd (1-D dates, keyed)
    "q_interval_overlap" -> { (s, dir) =>
      val iv = s.read
        .parquet(pq(dir, "orders"))
        .select(
          col("o_custkey"),
          to_date(col("o_orderdate")).as("s_date"),
          date_add(to_date(col("o_orderdate")), 30).as("e_date"))
      Intervals
        .overlapViolations(
          s,
          DataRef(FrameSource(iv, "order_intervals")),
          Seq("o_custkey"),
          Seq("s_date"),
          Seq("e_date"),
          endIncluded = true)
        .select(col("o_custkey"))
        .distinct()
    },

    // #9/#11 get_date_gaps
    "q_date_gaps" -> { (s, dir) =>
      val iv = s.read
        .parquet(pq(dir, "orders"))
        .select(
          col("o_custkey"),
          to_date(col("o_orderdate")).as("s_date"),
          date_add(to_date(col("o_orderdate")), 5).as("e_date"))
      Intervals
        .gapViolations(
          s,
          DataRef(FrameSource(iv, "order_intervals")),
          Seq("o_custkey"),
          "s_date",
          "e_date",
          Intervals.dateGapCondition(30.0))
        .select(col("o_custkey"))
        .distinct()
    },

    // #11 get_numeric_gaps
    "q_numeric_gaps" -> { (s, dir) =>
      val iv = s.read
        .parquet(pq(dir, "lineitem"))
        .select(
          col("l_suppkey"),
          col("l_quantity").as("s_num"),
          (col("l_quantity") + 2.0).as("e_num"))
      Intervals
        .gapViolations(
          s,
          DataRef(FrameSource(iv, "qty_intervals")),
          Seq("l_suppkey"),
          "s_num",
          "e_num",
          Intervals.numericGapCondition(3.0))
        .select(col("l_suppkey"))
        .distinct()
    },

    // #33/#34 cross-CDF (forward-filled full outer join of two ECDFs)
    "q_cross_cdf" -> { (s, dir) =>
      val r1 = ref(dir, "lineitem", Some(Seq("l_extendedprice")), Some("l_returnflag = 'R'"))
      val r2 = ref(dir, "lineitem", Some(Seq("l_extendedprice")), Some("l_returnflag = 'A'"))
      Stats.crossCdf(s, r1, r2, "val", "cdf")
    },

    // #35 get_ks_2sample
    "q_ks_2sample" -> { (s, dir) =>
      val r1 = ref(dir, "lineitem", Some(Seq("l_extendedprice")), Some("l_returnflag = 'R'"))
      val r2 = ref(dir, "lineitem", Some(Seq("l_extendedprice")), Some("l_returnflag = 'A'"))
      val d  = Stats.ks2Sample(s, r1, r2)
      one(s, Seq("ks_d"), Seq(Double.box(d)))
    },

    // #36 get_regex_violations (aggregated over DISTINCT values)
    "q_regex_count" -> { (s, dir) =>
      val (n, _) = Ops.getRegexViolations(
        s,
        ref(dir, "orders", Some(Seq("o_orderpriority"))),
        aggregated = true,
        regex = "^[1-3]-",
        nCounterexamples = 0)
      one(s, Seq("n_violations"), Seq(Long.box(n)))
    },
    "q_regex_sample" -> ((s, dir) =>
      ref(dir, "orders", Some(Seq("o_orderpriority")))
        .selection(s)
        .distinct()
        .where(col("o_orderpriority").isNotNull && !col("o_orderpriority").rlike("^[1-3]-"))),

    // groupby.py AggregateNumericRangeEquality: per-group collect_list vs range
    "q_groupby_range" -> ((s, dir) =>
      ref(dir, "lineitem", Some(Seq("l_orderkey", "l_linenumber")))
        .selection(s)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("arr"))
        .where(col("arr") =!= sequence(lit(1), size(col("arr"))))
        .select(col("l_orderkey")))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles — same column names, same rounding, BIGINT for counts.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "q_selection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity > 45""",
    "q_row_count" ->
      "SELECT count(*) AS n_rows FROM lineitem WHERE l_discount > 0.05",
    "q_row_count_capped" ->
      "SELECT count(*) AS n_rows FROM (SELECT * FROM lineitem LIMIT 1234)",
    "q_min_max" ->
      """SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
                cast(cast(min(l_shipdate) AS DATE) AS VARCHAR) AS min_ship,
                cast(cast(max(l_shipdate) AS DATE) AS VARCHAR) AS max_ship
         FROM lineitem""",
    "q_mean" ->
      """SELECT round(avg(l_quantity), 6) AS avg_qty,
                round(avg(cast(l_extendedprice AS DECIMAL(38,9))), 6) AS avg_price
         FROM lineitem""",
    "q_percentile" ->
      """WITH c AS (SELECT l_extendedprice AS v, count(*) AS cnt FROM lineitem
                    WHERE l_extendedprice IS NOT NULL GROUP BY 1),
              c2 AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum, sum(cnt) OVER () AS total FROM c)
         SELECT min(CASE WHEN cum*100 >= total*25 THEN v END) AS p25,
                min(CASE WHEN cum*100 >= total*50 THEN v END) AS p50,
                min(CASE WHEN cum*100 >= total*90 THEN v END) AS p90
         FROM c2""",
    "q_min_max_length" ->
      """SELECT cast(min(length(p_name)) AS BIGINT) AS min_len,
                cast(max(length(p_name)) AS BIGINT) AS max_len FROM part""",
    "q_fraction_between" ->
      """SELECT round(cast(count(*) FILTER (WHERE l_quantity >= 10 AND l_quantity <= 40) AS DOUBLE)
                / count(*), 6) AS frac FROM lineitem""",
    "q_uniques" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem GROUP BY 1, 2""",
    "q_unique_count" ->
      """SELECT count(*) AS n_unique FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)""",
    "q_unique_count_union" ->
      """SELECT count(*) AS n_unique FROM
         (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)""",
    "q_missing_fraction" ->
      """SELECT round(cast(count(*) - count(nullif(o_orderpriority, '1-URGENT')) AS DOUBLE)
                / count(*), 6) AS null_frac FROM orders""",
    "q_column_names" ->
      """SELECT column_name FROM (DESCRIBE SELECT * FROM customer) ORDER BY column_name""",
    "q_column_type" ->
      """SELECT lower(column_type) AS col_type FROM (DESCRIBE SELECT c_custkey FROM customer)""",
    "q_row_diff" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 50000
         EXCEPT
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'""",
    "q_row_diff_count" ->
      """SELECT count(*) AS n_diff FROM (
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 50000
           EXCEPT
           SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F')""",
    "q_row_mismatch" ->
      """SELECT round(avg(CASE WHEN a.o_orderpriority IS NOT DISTINCT FROM b.p2
                               THEN 0.0 ELSE 1.0 END), 6) AS mismatch_frac,
                count(*) AS n_rows
         FROM orders a
         JOIN (SELECT o_orderkey, nullif(o_orderpriority, '2-HIGH') AS p2 FROM orders) b
           ON a.o_orderkey = b.o_orderkey""",
    "q_duplicates" ->
      """SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1""",
    "q_functional_dependency" ->
      """WITH u AS (SELECT DISTINCT o_custkey, o_orderstatus FROM orders),
              bad AS (SELECT o_custkey FROM u GROUP BY 1 HAVING count(*) > 1)
         SELECT u.o_custkey, u.o_orderstatus FROM u JOIN bad USING (o_custkey)""",
    "q_array_agg" ->
      """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
         FROM nation GROUP BY n_regionkey""",
    "q_date_span" ->
      """SELECT cast(date_diff('day', min(cast(o_orderdate AS DATE)),
                               max(cast(o_orderdate AS DATE))) AS BIGINT) AS span_days
         FROM orders""",
    "q_interval_overlap" ->
      """WITH iv AS (SELECT o_custkey, cast(o_orderdate AS DATE) AS s_date,
                            cast(o_orderdate AS DATE) + 30 AS e_date FROM orders),
              dup AS (SELECT o_custkey FROM iv GROUP BY o_custkey, s_date, e_date HAVING count(*) > 1),
              ovl AS (SELECT a.o_custkey FROM iv a JOIN iv b
                      ON a.o_custkey = b.o_custkey AND a.s_date <= b.s_date
                      AND a.e_date >= b.s_date
                      AND (a.s_date <> b.s_date OR a.e_date <> b.e_date))
         SELECT DISTINCT o_custkey FROM (SELECT * FROM dup UNION ALL SELECT * FROM ovl)""",
    "q_date_gaps" ->
      """WITH iv AS (SELECT o_custkey AS k, cast(o_orderdate AS DATE) AS s_date,
                            cast(o_orderdate AS DATE) + 5 AS e_date FROM orders),
              st AS (SELECT k, s_date, row_number() OVER (PARTITION BY k ORDER BY s_date) AS r
                     FROM iv a WHERE NOT EXISTS (SELECT 1 FROM iv h WHERE h.k = a.k
                       AND a.s_date > h.s_date AND a.s_date < h.e_date)),
              en AS (SELECT k, e_date, row_number() OVER (PARTITION BY k ORDER BY e_date) AS r
                     FROM iv a WHERE NOT EXISTS (SELECT 1 FROM iv h WHERE h.k = a.k
                       AND a.e_date > h.s_date AND a.e_date < h.e_date))
         SELECT DISTINCT st.k AS o_custkey FROM st JOIN en
           ON st.k = en.k AND st.r = en.r + 1 AND date_diff('day', en.e_date, st.s_date) > 30""",
    "q_numeric_gaps" ->
      """WITH iv AS (SELECT l_suppkey AS k, l_quantity AS s_num, l_quantity + 2.0 AS e_num FROM lineitem),
              st AS (SELECT k, s_num, row_number() OVER (PARTITION BY k ORDER BY s_num) AS r
                     FROM iv a WHERE NOT EXISTS (SELECT 1 FROM iv h WHERE h.k = a.k
                       AND a.s_num > h.s_num AND a.s_num < h.e_num)),
              en AS (SELECT k, e_num, row_number() OVER (PARTITION BY k ORDER BY e_num) AS r
                     FROM iv a WHERE NOT EXISTS (SELECT 1 FROM iv h WHERE h.k = a.k
                       AND a.e_num > h.s_num AND a.e_num < h.e_num))
         SELECT DISTINCT st.k AS l_suppkey FROM st JOIN en
           ON st.k = en.k AND st.r = en.r + 1 AND st.s_num - en.e_num > 3.0""",
    "q_cross_cdf" ->
      """WITH s1 AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R'),
              s2 AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'A'),
              c1 AS (SELECT v, cast(sum(cnt) OVER (ORDER BY v) AS DOUBLE) / sum(cnt) OVER () AS cdf1
                     FROM (SELECT v, count(*) AS cnt FROM s1 GROUP BY 1)),
              c2 AS (SELECT v, cast(sum(cnt) OVER (ORDER BY v) AS DOUBLE) / sum(cnt) OVER () AS cdf2
                     FROM (SELECT v, count(*) AS cnt FROM s2 GROUP BY 1)),
              j AS (SELECT coalesce(c1.v, c2.v) AS val, c1.cdf1, c2.cdf2
                    FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v)
         SELECT val,
                coalesce(last_value(cdf1 IGNORE NULLS) OVER
                  (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cdf1,
                coalesce(last_value(cdf2 IGNORE NULLS) OVER
                  (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cdf2
         FROM j""",
    "q_ks_2sample" ->
      """WITH s1 AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R'),
              s2 AS (SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'A'),
              c1 AS (SELECT v, cast(sum(cnt) OVER (ORDER BY v) AS DOUBLE) / sum(cnt) OVER () AS cdf1
                     FROM (SELECT v, count(*) AS cnt FROM s1 GROUP BY 1)),
              c2 AS (SELECT v, cast(sum(cnt) OVER (ORDER BY v) AS DOUBLE) / sum(cnt) OVER () AS cdf2
                     FROM (SELECT v, count(*) AS cnt FROM s2 GROUP BY 1)),
              j AS (SELECT coalesce(c1.v, c2.v) AS val, c1.cdf1, c2.cdf2
                    FROM c1 FULL OUTER JOIN c2 ON c1.v = c2.v),
              f AS (SELECT val,
                coalesce(last_value(cdf1 IGNORE NULLS) OVER
                  (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cdf1,
                coalesce(last_value(cdf2 IGNORE NULLS) OVER
                  (ORDER BY val ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS cdf2
                FROM j)
         SELECT max(abs(cdf1 - cdf2)) AS ks_d FROM f""",
    "q_regex_count" ->
      """SELECT count(*) AS n_violations FROM
         (SELECT DISTINCT o_orderpriority FROM orders)
         WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-')""",
    "q_regex_sample" ->
      """SELECT DISTINCT o_orderpriority FROM orders
         WHERE o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-3]-')""",
    "q_groupby_range" ->
      """SELECT l_orderkey FROM (
           SELECT l_orderkey, list_sort(list(l_linenumber)) AS arr, count(*) AS n
           FROM lineitem GROUP BY l_orderkey)
         WHERE arr <> range(1, cast(n AS INTEGER) + 1)"""
  )

  private implicit class SeqAsJava[A](private val s: Seq[A]) {
    def asJava: java.util.List[A] = {
      val l = new java.util.ArrayList[A](s.length)
      s.foreach(l.add)
      l
    }
  }
}

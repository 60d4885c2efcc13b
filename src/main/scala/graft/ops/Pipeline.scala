package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the standard training-data filter chain
  * composed as ONE declarative plan:
  *
  *   language gate → quality gate → exact dedup (keep min-id per content
  *   fingerprint)
  *
  * Plan shape: the gates are codegen'd per-row scoring inside the scan's
  * WholeStageCodegen span (filters fuse; nothing materializes between
  * stages), and the only shuffle is the fingerprint groupBy of the exact
  * dedup — the same plan at 100 TB, with the gates running before the
  * shuffle so only surviving rows move.
  *
  * The quality threshold compares at 1e-6 quantization (`round(q, 6)`) so
  * the decision is bit-portable across engines — the same convention the
  * correctness oracle uses for double-valued outputs.
  */
object Pipeline {

  def curateCorpus(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.55,
      langs: Seq[String] = Seq("en")): DataFrame = {
    val t: Column = col(textCol)
    val gated = df
      .where(t.isNotNull)
      .where(TextAnalysis.langId(t).isin(langs: _*))
      .where(round(TextAnalysis.qualityScore(t), 6) >= minQuality)
    Dedup.dedupExact(gated, textCol, idCol)
  }
}

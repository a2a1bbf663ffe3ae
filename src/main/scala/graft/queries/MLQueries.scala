package graft.queries

import Registry.Entry

/** MLlib surface: SURVEY.md §2.7 (M1-M16) — feature pipelines, KMeans,
  * ALS, TF-IDF, cosine top-k. Populated incrementally; relational twins of
  * the ML-shaped queries (scored top-k, per-user ranking) live in
  * [[Windows]] and [[LlmQueries]].
  */
object MLQueries {
  val entries: Seq[Entry] = Seq.empty
}

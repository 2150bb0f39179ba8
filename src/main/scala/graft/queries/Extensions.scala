package graft.queries

import graft.{GraftQuery, QueryModule}

/** North-star extension operators (SURVEY.md §2.11): dedup family,
  * similarity search, text analysis, multimodal plumbing. Populated by M3.
  */
object Extensions extends QueryModule {
  override val queries: Seq[GraftQuery] = Seq()
}

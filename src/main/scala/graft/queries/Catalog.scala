package graft.queries

/** The full declared query catalog (SURVEY §2.2–§2.6): relational Q1–Q27,
  * the LLM-pipeline extensions Q28–Q44, the corpus/behavioral analytics
  * queries Q45–Q49, and the round-6+ curation/retrieval additions. Names
  * are unique and stable — the driver keys CORRECTNESS/BENCH artifacts on
  * them.
  */
object Catalog {
  val all: Seq[Q] = Relational.qs ++ Llm.qs ++ Analytics.qs ++ Curation.qs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}

package graft.core

/** SQL confs every graft session sets (main drivers and specs alike).
  *
  * `runtime.bloomFilter.enabled=false`: Spark injects runtime bloom
  * filters into shuffle equi-joins whose creation side looks small.
  * Our hot joins never benefit — the genuinely small sides ride
  * explicit `broadcast()` hints, and the corpus-sized joins are
  * already pre-bounded by semi-joins — but the injected filters cost
  * real time: the index builds and beam searches run over
  * `localCheckpoint` boundaries, which erase row statistics, so every
  * filter is sized for the 1M-item default (1 MiB of bitset) and the
  * serialized filter rides EVERY task binary of every consuming
  * stage. Measured on the NSW build/delta path at sf0.01: 8-12 MiB
  * task binaries per stage (the DAGScheduler "broadcasting large task
  * binary" warnings), all of it near-empty bloom bitsets guarding
  * joins against a 2,250-row side. On a real cluster with
  * statistics-bearing tables an operator may re-enable the feature
  * per query; the library default is off.
  */
object EngineConf {
  val recommended: Map[String, String] = Map(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
    // registers the (default-inert) ANN top-k rewrite rule; it does
    // nothing unless spark.graft.ann.rewrite=true in the session
    "spark.sql.extensions" -> "graft.plans.GraftExtensions")
}

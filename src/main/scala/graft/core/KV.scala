package graft.core

/** The reference engine's single record type: string-typed key/value.
  *
  * Mirrors `KeyValue` in the reference (src/mr/worker.go:23-26). Keys and
  * values are strings end-to-end; numeric results are carried as decimal
  * strings at the output boundary (reference: src/mrapps/wc.go:39).
  */
final case class KV(key: String, value: String)

/** A pluggable (Map, Reduce) UDF pair — the reference's entire user-facing
  * programming model (src/mr/worker.go:137-138, loaded from Go plugins at
  * src/main/mrworker.go:32-49). Here it is a plain trait + registry; no
  * dynamic loading is needed on the JVM.
  *
  *  - `map(file, contents)`: one whole input file per call, returns any
  *    number of KV pairs (a flatMap / UDTF shape).
  *  - `reduce(key, values)`: receives ALL values for `key` as a
  *    materialized list — list semantics, not a fold
  *    (src/mr/worker.go:197-207). Order of `values` is unspecified in the
  *    reference (it is whatever the by-key sort left adjacent); every
  *    shipped app is order-insensitive (wc counts, indexer/nocrash sort
  *    internally).
  */
trait MrApp extends Serializable {
  def name: String
  def map(file: String, contents: String): Seq[KV]
  def reduce(key: String, values: Seq[String]): String
}

object MrApp {
  /** Registry replacing the reference's .so plugin loader
    * (src/main/mrworker.go:32-49). Populated in [[graft.apps.Apps]].
    */
  def all: Map[String, MrApp] = graft.apps.Apps.registry
}

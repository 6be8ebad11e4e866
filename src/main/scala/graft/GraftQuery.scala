package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability, wired into the driver contract.
  *
  * @param name   stable query name (key in `SparkEntry.queries`)
  * @param doc    what it demonstrates + reference citation (file:line under /root/reference)
  * @param fn     (session, sfDir) => result DataFrame. Results are always
  *               deterministically ordered and double columns are rounded so the
  *               driver's DuckDB hash-compare is stable across engines.
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops that are not SQL-expressible (streaming state, ANN recall)
  *               — those are covered by ScalaTest instead.
  * @param boundedBy REQUIRED when `oracle` is None: the ScalaTest suite that
  *               pins this query's estimate/order contract, so the
  *               correctness dump self-describes the verification path of
  *               every no-oracle row (a bare "no_oracle" is otherwise
  *               indistinguishable from "unverified" to a cold reader).
  */
final case class GraftQuery(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    boundedBy: Option[String] = None)

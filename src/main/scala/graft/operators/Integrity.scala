package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity checking as a runtime operator — the engine's
  * version of the reference's declarative FK constraints
  * (`init_stg.sql:275-343`, `init_dwh.sql:148-196`), which Postgres
  * enforces on insert but a lake has to verify by query.
  *
  * A violation check is a left-anti join (child keys with no parent) —
  * broadcast when the parent is dimension-sized, so the child table
  * never shuffles. NULL FKs are not violations (SQL FK semantics). */
object Integrity {

  /** Child rows whose `childKey` has no match in `parent.parentKey`. */
  def fkViolations(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String,
                   broadcastParent: Boolean = true): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    val pSide = if (broadcastParent) broadcast(p) else p
    child.filter(col(childKey).isNotNull)
      .join(pSide, col(childKey) === col("__pk"), "left_anti")
  }

  /** One summary row per declared FK: (fk_name, child_key, n_violations).
    * All FKs are checked in ONE Spark job: each check is a global
    * aggregate (so zero-violation FKs still produce a row) and the
    * per-FK aggregates are unioned into a single lazy plan — the caller's
    * one action runs them together, instead of N serial count() jobs
    * from the driver. */
  def report(spark: SparkSession,
             fks: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    fks.map { case (name, child, childKey, parent, parentKey) =>
      fkViolations(child, childKey, parent, parentKey)
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("fk_name"), lit(childKey).as("child_key"),
          col("n_violations"))
    }.reduce(_ unionByName _)
}

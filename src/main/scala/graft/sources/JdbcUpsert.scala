package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** S7: keyed JDBC upsert — the engine's version of the reference's
  * `pangres.upsert(..., if_row_exists='update')` into staging.milestones
  * (staging `load.py:94-118`). Spark has no native JDBC MERGE, so this is
  * the documented hard-part (SURVEY §7.4 hard #1), implemented as option
  * (a): `foreachPartition` + batched `INSERT … ON CONFLICT (pk) DO UPDATE`.
  *
  * Scale properties: each partition opens ONE connection and writes in
  * `batchSize` batches — total connections = numPartitions (caller should
  * coalesce to a DB-friendly count); no driver-side collect; works for any
  * DataFrame schema (statement is built from the schema once per
  * partition).
  */
object JdbcUpsert {

  /** Build the PostgreSQL `INSERT … ON CONFLICT DO UPDATE` statement for
    * a schema. Exposed for tests (no live DB in the test environment). */
  def upsertStatement(table: String, schema: StructType, keyCols: Seq[String]): String = {
    val cols = schema.fields.map(_.name)
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"""INSERT INTO $table (${cols.mkString(", ")}) VALUES ($placeholders)
       |ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $updates""".stripMargin
  }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = if (row.isNullAt(i)) null else row.get(i)
      (v, f.dataType) match {
        case (null, _)              => ps.setObject(i + 1, null)
        case (x: java.math.BigDecimal, _: DecimalType) => ps.setBigDecimal(i + 1, x)
        case (x: java.sql.Timestamp, TimestampType)    => ps.setTimestamp(i + 1, x)
        case (x: java.sql.Date, DateType)              => ps.setDate(i + 1, x)
        case (x, _)                 => ps.setObject(i + 1, x)
      }
    }

  /** Execute the upsert. `connections` bounds DB fan-in. */
  def upsert(df: DataFrame, url: String, table: String,
             props: java.util.Properties, keyCols: Seq[String],
             connections: Int = 8, batchSize: Int = 1000): Unit = {
    val schema = df.schema
    val sql = upsertStatement(table, schema, keyCols)
    val (user, pass) = (props.getProperty("user"), props.getProperty("password"))
    df.coalesce(connections).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url, user, pass)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            bind(ps, r, schema)
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) ps.executeBatch()
          }
          ps.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }

  /** Lake-side upsert equivalent (SURVEY §7.4 option (c)): merge a delta
    * batch into an existing snapshot keeping the newest row per key —
    * what `dropDuplicates`-on-union gives when `versionCol` orders
    * versions. Version ties resolve in favor of the DELTA row (the
    * reference's `if_row_exists='update'` semantics: an incoming row
    * replaces the stored one), which also makes same-batch replays
    * deterministic. Pure DataFrame; no DB. */
  def mergeByKey(existing: DataFrame, delta: DataFrame,
                 keyCols: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    existing.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}

package graft.sources

import java.sql.{Connection, DriverManager, ResultSet}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Envelope
import graft.sources.Connectors.{Sink, Source}

/** Live JDBC connectors — the reference's SQL-store adaptors
  * (`adaptor/postgres/reader.go:28-190`, `adaptor/postgres/writer.go:33-201`,
  * `adaptor/mysql/reader.go:33-261`) re-expressed over Spark's JDBC data
  * source. What the reference hand-rolls, Spark provides:
  *
  *   - table discovery (`information_schema.tables`,
  *     `postgres/reader.go:61-88`) → `DatabaseMetaData.getTables`, with the
  *     namespace regex applied BEFORE any table is read (listing pushdown,
  *     `pipeline/node.go:453`);
  *   - per-column type discovery + `casifyValue` string→typed casts
  *     (`postgres/reader.go:113-121`, `tailer.go:236-288`) → the JDBC
  *     source reads typed values through the driver; no string round-trip
  *     exists to undo;
  *   - the resumable `id > last` cursor re-query
  *     (`adaptor/mongodb/reader.go:172-181`) → a Catalyst filter that the
  *     JDBC relation compiles into the remote WHERE clause — visible as
  *     `PushedFilters: [GreaterThan(...)]` in the scan node, so the
  *     database, not Spark, skips the already-synced prefix;
  *   - PK discovery for upserts (`postgres/writer.go:162-201`
  *     `information_schema.table_constraints`) →
  *     `DatabaseMetaData.getPrimaryKeys`.
  *
  * Scale: a single-table snapshot can be split into N parallel bounded
  * range queries (`partitionColumn`/`numPartitions`) so a 1000-executor
  * cluster reads 1000 disjoint slices concurrently — the reference reads
  * every table on one goroutine. The upsert sink compacts CDC to one final
  * row per key in Spark (one shuffle) and then MERGEs per partition over
  * its own connection; distinct keys mean partitions never contend on a
  * row, and MERGE/DELETE are idempotent so at-least-once replay converges.
  *
  * Tested against embedded Derby (`/opt/spark/jars/derby*.jar`) — the same
  * code paths (DriverManager, metadata, MERGE, Spark JDBC relation) a
  * deployed postgres/mysql URL would exercise.
  */
object Jdbc {

  /** Run `f` with a fresh driver-managed connection. */
  private def withConnection[A](url: String, props: Map[String, String])(
      f: Connection => A): A = {
    props.get("driver").foreach(Class.forName(_))
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val c = DriverManager.getConnection(url, p)
    try f(c) finally c.close()
  }

  private def drain[A](rs: ResultSet)(f: ResultSet => A): Seq[A] = {
    val b = Seq.newBuilder[A]
    while (rs.next()) b += f(rs)
    rs.close()
    b.result()
  }

  /** List table names visible at `url` (optionally within `schema`),
    * mirroring the reference's `information_schema.tables` scan. */
  def listTables(url: String, schema: Option[String] = None,
      props: Map[String, String] = Map.empty): Seq[String] =
    withConnection(url, props) { c =>
      drain(c.getMetaData.getTables(null, schema.orNull, "%",
        Array("TABLE")))(_.getString("TABLE_NAME"))
    }

  /** Primary-key columns of `table`, in key order
    * (`adaptor/postgres/writer.go:162-201`). */
  def primaryKeys(url: String, table: String,
      props: Map[String, String] = Map.empty): Seq[String] =
    withConnection(url, props) { c =>
      drain(c.getMetaData.getPrimaryKeys(null, null, table)) { rs =>
        (rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME"))
      }.sortBy(_._1).map(_._2)
    }

  /** Snapshot source for one table. `resumeIdCol`/`resumeAfter` is the
    * reference's resumable cursor: the filter is pushed into the remote
    * query by the JDBC relation (assert `PushedFilters` in the plan).
    * `partitionColumn` splits the snapshot into `numPartitions` parallel
    * bounded range queries — the 100 TB read path. */
  final case class JdbcTableSource(url: String, table: String,
      ns: Option[String] = None,
      resumeIdCol: Option[String] = None,
      resumeAfter: Option[Any] = None,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 1,
      options: Map[String, String] = Map.empty) extends Source {
    def read(spark: SparkSession): DataFrame = {
      var r = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
      options.foreach { case (k, v) => r = r.option(k, v) }
      partitionColumn.foreach { pc =>
        // bounds queried once up front; at scale pass them in via options
        val (lo, hi) = withConnection(url, options) { c =>
          val rs = c.createStatement().executeQuery(
            s"SELECT MIN($pc), MAX($pc) FROM $table")
          rs.next(); (rs.getLong(1), rs.getLong(2))
        }
        r = r.option("partitionColumn", pc)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      }
      val base = r.load()
      val resumed = (resumeIdCol, resumeAfter) match {
        case (Some(c), Some(v)) => base.filter(col(c) > lit(v))
        case _ => base
      }
      Envelope.wrap(resumed, ns.getOrElse(table.toLowerCase))
    }
  }

  /** Multi-table snapshot: metadata listing → ns-regex filter (BEFORE any
    * read — listing pushdown) → tagged union of per-table envelopes, the
    * postgres reader's whole-database scan. */
  final case class JdbcMultiTableSource(url: String, nsRegex: String = ".*",
      schema: Option[String] = None,
      options: Map[String, String] = Map.empty) extends Source {
    def read(spark: SparkSession): DataFrame = {
      val re = java.util.regex.Pattern.compile(
        nsRegex.stripPrefix("/").stripSuffix("/"))
      val chosen = listTables(url, schema, options)
        .filter(t => re.matcher(t.toLowerCase).find())
      require(chosen.nonEmpty, s"no table at $url matches /${re.pattern()}/")
      chosen.sorted
        .map(t => JdbcTableSource(url, t, options = options).read(spark))
        .reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** Plain append/overwrite JDBC sink (`df.write.jdbc`). */
  final case class JdbcSink(url: String, table: String,
      mode: String = "append",
      options: Map[String, String] = Map.empty) extends Sink {
    def write(df: DataFrame): Unit = {
      var w = Envelope.unwrap(df).write.format("jdbc").mode(mode)
        .option("url", url).option("dbtable", table)
      options.foreach { case (k, v) => w = w.option(k, v) }
      w.save()
    }
  }

  private def sqlTypeOf(dt: DataType): Int = dt match {
    case BooleanType => java.sql.Types.BOOLEAN
    case ByteType => java.sql.Types.TINYINT
    case ShortType => java.sql.Types.SMALLINT
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case FloatType => java.sql.Types.REAL
    case DoubleType => java.sql.Types.DOUBLE
    case _: DecimalType => java.sql.Types.DECIMAL
    case StringType => java.sql.Types.VARCHAR
    case BinaryType => java.sql.Types.BINARY
    case DateType => java.sql.Types.DATE
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case other => throw new IllegalArgumentException(
      s"unsupported JDBC upsert column type: ${other.sql}")
  }

  /** Idempotent CDC upsert sink — `adaptor/postgres/writer.go:33-160`'s
    * op dispatch (INSERT / UPDATE WHERE pk / DELETE WHERE pk), Spark-first:
    *
    *   1. compact the epoch to its LAST state per key in Spark
    *      (`Upsert.applyCdc` algebra; one shuffle, map-side combinable) —
    *      each key then reaches the database exactly once, so partitions
    *      apply concurrently with no cross-row ordering hazards;
    *   2. per partition, one connection: ANSI `MERGE INTO` for surviving
    *      rows, `DELETE WHERE pk` for deleted keys — both idempotent, so
    *      at-least-once epoch replay converges (the reference gets the
    *      same property from insert-dup→update,
    *      `adaptor/mongodb/writer.go:53-59`).
    *
    * PKs come from connector metadata unless given. Expects envelope CDC
    * columns (op + data); `orderCols` break ties within the epoch
    * (defaults to the envelope ts).
    */
  final case class JdbcUpsertSink(url: String, table: String,
      idCols: Seq[String] = Nil,
      orderCols: Seq[String] = Nil,
      batchSize: Int = 500,
      options: Map[String, String] = Map.empty) extends Sink {

    def write(rawDf: DataFrame): Unit = {
      val keys = if (idCols.nonEmpty) idCols else primaryKeys(url, table, options)
      require(keys.nonEmpty, s"no primary key found for $table; pass idCols")
      // only effective ops mutate state (noop/command/skip pass through the
      // pipe but never reach a writer — adaptor op dispatch)
      val df = rawDf.filter(col(Envelope.OpCol).isin(
        Envelope.Op.Insert, Envelope.Op.Update, Envelope.Op.Delete))

      val ordering =
        if (orderCols.nonEmpty) orderCols.map(col)
        else Seq(col(Envelope.TsCol))
      // LAST op per key wins inside the epoch (log order = ordering cols):
      // max_by over a struct of (ordering..., whole row)
      val ordStruct = struct(ordering :+ struct(df.columns.map(col): _*): _*)
      val lastIdx = ordering.size
      val finalOps = df
        .groupBy(keys.map(col): _*)
        .agg(max(ordStruct).as("w"))
        .select(col(s"w.col${lastIdx + 1}.*"))

      // envelope metadata beyond op/ts/ns (the Sync-phase mode marker and
      // the CDC order column) never lands in the relational row either —
      // same drop the mongo apply path does (MongoOplog.applyCdc)
      val dataCols = Envelope.unwrap(finalOps).columns.toSeq
        .filterNot(Seq(Envelope.ModeCol, Envelope.SeqCol).contains)
      val nonKey = dataCols.filterNot(keys.contains)
      val schema = finalOps.schema
      val colType = schema.fields.map(f => f.name -> sqlTypeOf2(f.dataType)).toMap

      val mergeSql = {
        val on = keys.map(k => s"t.$k = ?").mkString(" AND ")
        val set = nonKey.map(c => s"$c = ?").mkString(", ")
        val insCols = dataCols.mkString(", ")
        val insVals = dataCols.map(_ => "?").mkString(", ")
        val matched = if (nonKey.nonEmpty)
          s"WHEN MATCHED THEN UPDATE SET $set " else ""
        s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on) " + matched +
          s"WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"
      }
      val deleteSql =
        s"DELETE FROM $table WHERE " + keys.map(k => s"$k = ?").mkString(" AND ")

      val urlL = url; val optionsL = options; val keysL = keys
      val nonKeyL = nonKey; val dataColsL = dataCols
      val batchSizeL = batchSize; val mergeSqlL = mergeSql
      val deleteSqlL = deleteSql
      val opIdx = schema.fieldIndex(Envelope.OpCol)
      val fieldIdx = schema.fieldNames.zipWithIndex.toMap

      finalOps.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.nonEmpty) withConnection(urlL, optionsL) { conn =>
          conn.setAutoCommit(false)
          val merge = conn.prepareStatement(mergeSqlL)
          val del = conn.prepareStatement(deleteSqlL)
          var pendingMerge = 0
          var pendingDel = 0
          def bind(ps: java.sql.PreparedStatement, i: Int, row: Row,
              c: String, types: Map[String, Int]): Unit = {
            val v = row.get(fieldIdx(c))
            if (v == null) ps.setNull(i, types(c)) else ps.setObject(i, v)
          }
          rows.foreach { row =>
            if (row.getString(opIdx) == Envelope.Op.Delete) {
              keysL.zipWithIndex.foreach { case (k, i) =>
                bind(del, i + 1, row, k, colType) }
              del.addBatch(); pendingDel += 1
              if (pendingDel >= batchSizeL) { del.executeBatch(); pendingDel = 0 }
            } else {
              var i = 1
              keysL.foreach { k => bind(merge, i, row, k, colType); i += 1 }
              nonKeyL.foreach { c => bind(merge, i, row, c, colType); i += 1 }
              dataColsL.foreach { c => bind(merge, i, row, c, colType); i += 1 }
              merge.addBatch(); pendingMerge += 1
              if (pendingMerge >= batchSizeL) { merge.executeBatch(); pendingMerge = 0 }
            }
          }
          if (pendingMerge > 0) merge.executeBatch()
          if (pendingDel > 0) del.executeBatch()
          conn.commit()
        }
      }
    }
  }

  // serializable alias used inside the closure above
  private def sqlTypeOf2(dt: DataType): Int = sqlTypeOf(dt)
}

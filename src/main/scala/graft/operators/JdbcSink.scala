package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** JDBC sink — the warehouse-loader capability (aggregate → INSERT into an
  * external SQL store via `df.write.format("jdbc")`), previously doc-only
  * (SURVEY §2.A r1-r5: "no ClickHouse, no driver jar offline"). Round-6
  * probe found Apache Derby 10.16 on the Spark unmanaged classpath
  * (/opt/spark/jars/derby*.jar — it ships with Spark for the Hive
  * metastore), so the write path now runs for real against an EMBEDDED
  * Derby database and the round-trip is oracle-checked end to end:
  * aggregate orders → JDBC overwrite-write → JDBC read-back.
  *
  * Production (ClickHouse) deployment notes — same code, different URL +
  * options; these are the knobs that matter at load scale:
  *   - `.option("url", "jdbc:clickhouse://host:8123/db")` with the
  *     ClickHouse JDBC driver on the executor classpath;
  *   - `.option("batchsize", 10000)` (or higher) — ClickHouse wants FEW
  *     LARGE inserts; per-row INSERT is pathological;
  *   - `.option("isolationLevel", "NONE")` — ClickHouse has no
  *     transactions; skipping the per-batch commit handshake matters;
  *   - `.option("numPartitions", N)` caps concurrent connections (each
  *     write task opens one); coalesce the frame to N first;
  *   - `.option("createTableOptions", "ENGINE = MergeTree ORDER BY k")`
  *     so an overwrite-create lands on the right table engine;
  *   - MySQL-protocol targets additionally want
  *     `rewriteBatchedStatements=true` in the URL to turn the JDBC batch
  *     into one multi-row INSERT.
  *
  * Scale shape: the aggregate reduces upstream (partial aggs, one
  * shuffle); the write moves only the aggregated frame — one connection
  * per partition, batched inserts. The sink is the narrow end of the
  * funnel by design: never JDBC-write a fact table, land it as parquet
  * and load from object storage instead.
  */
object JdbcSink {

  private def rm(f: java.io.File): Unit = {
    val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
  }

  /** Remove sibling `derby_*` dirs that no live JVM owns (ADVICE r6): a
    * crashed/killed run never executes its shutdown hook, so its UUID dir
    * would leak tmpfs forever. Stale = older than the age cutoff AND its
    * `dbex.lck` is not exclusively locked — Derby holds a FileLock on
    * that file for the whole boot exactly so dual-booters can detect a
    * live owner; `tryLock` succeeding proves there is none. The age gate
    * keeps the sweep away from a sibling mid-boot (lock file created a
    * moment after the dir).
    *
    * Caveat (ADVICE r7): Derby's dbex.lck lock is BEST-EFFORT — on
    * filesystems where java.nio FileLock is unsupported or advisory-broken
    * (NFS, some container mounts) Derby runs without holding it, and the
    * probe would "prove" a live sibling dead. Two mitigations: the roots
    * used here are tmpfs//tmp (local filesystems where FileLock works),
    * and every boot refreshes its own dir's mtime below, so a LIVE
    * long-running sibling also stays behind the age gate. */
  private[graft] def sweepStale(root: java.io.File, cutoffMs: Long): Unit = {
    val olds = root.listFiles()
    if (olds == null) return
    olds.filter(f => f.isDirectory && f.getName.startsWith("derby_") &&
        f.lastModified < cutoffMs).foreach { d =>
      val lck = new java.io.File(d, "dbex.lck")
      val free =
        if (!lck.exists) true
        else try {
          val ch = java.nio.channels.FileChannel.open(lck.toPath,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            val l = ch.tryLock()
            if (l != null) { l.release(); true } else false
          } finally ch.close()
        } catch { case _: Throwable => false } // can't prove it's dead -> keep
      if (free) rm(d)
    }
  }

  /** One embedded-Derby path per JVM: concurrent JVMs (sbt test vs
    * Verify) must not fight over Derby's single-JVM boot lock, while
    * repeated calls in one session reuse the database via overwrite. */
  private lazy val dbPath: String = {
    val root = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_io" else "/tmp/graft_io"
    // derby.log lands in derby.system.home instead of the repo cwd
    new java.io.File(root).mkdirs()
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", root)
    // reap what crashed predecessors left behind (1 h age + lock probe)
    try sweepStale(new java.io.File(root), System.currentTimeMillis() - 3600L * 1000)
    catch { case _: Throwable => () }
    val p = s"$root/derby_${java.util.UUID.randomUUID().toString.take(8)}"
    // tmpfs hygiene: this JVM's database dir must not outlive it (the
    // per-JVM UUID prevents boot-lock fights between concurrent JVMs, so
    // LIVE siblings are protected by sweepStale's lock probe and only
    // provably-dead dirs are reaped). Shut Derby down first so the store
    // is quiescent.
    sys.addShutdownHook {
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$p;shutdown=true")
      catch { case _: java.sql.SQLException => () } // XJ015/08006 = clean shutdown
      rm(new java.io.File(p))
    }
    p
  }

  /** This JVM's embedded-Derby connection URL, shared with the streaming
    * warehouse sink (`stream_jdbc_sink` — round 16): one database per
    * JVM, separate tables per operator. Refreshes the database dir's
    * mtime on every use so the age gate alone protects a long-lived JVM
    * even where FileLock is a no-op (sweepStale's caveat); no-op before
    * Derby first creates the dir. */
  private[graft] def jdbcUrl: String = {
    new java.io.File(dbPath).setLastModified(System.currentTimeMillis()): Unit
    s"jdbc:derby:$dbPath;create=true"
  }

  def jdbcSink(spark: SparkSession, dir: String): DataFrame = {
    val url = jdbcUrl
    val agg = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("rev"))
    agg.coalesce(1) // 5-row dim load: one connection, one batch
      .write.format("jdbc")
      .mode(SaveMode.Overwrite)
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "load_summary")
      .option("batchsize", "1000")
      // Derby's dialect maps StringType to CLOB; pin a comparable type
      .option("createTableColumnTypes", "o_orderpriority VARCHAR(20)")
      .save()
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("dbtable", "load_summary")
      .load()
      .select(col("o_orderpriority"), col("n"), col("rev"))
      .orderBy(col("o_orderpriority").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jdbc_sink" -> (jdbcSink _))

  /** The oracle sees only what went THROUGH the database: if the JDBC
    * round-trip dropped rows or mangled types, the hash check fails. */
  val oracleSql: Map[String, String] = Map(
    "jdbc_sink" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS rev
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin)
}

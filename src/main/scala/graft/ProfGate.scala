package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic: run ONE gate from [[SparkEntry.queries]] and print every
  * Spark job it launches (duration + call site), slowest first — the
  * job-by-job profile of a write-lifecycle gate's fixed cost. Usage:
  * `runMain graft.ProfGate <gate> [sfDir]`. Warm-runs the gate once so
  * the profile reflects steady state (the Bench discipline). */
object ProfGate {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.catalog.GraftConfig(
      snapshotCache = graft.catalog.CacheConfig(20, 3600000L),
      fileListCache = graft.catalog.CacheConfig(100, 3600000L),
      authCache = graft.catalog.CacheConfig(100, 3600000L)).applyCaches()
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Double, String, Long)]()
    // executionId -> the graft call site of the SQL execution that owns
    // it (async broadcast/AQE-stage jobs carry no graft frame in their
    // own stage details, but they DO carry spark.sql.execution.id)
    val execSite = new java.util.concurrent.ConcurrentHashMap[
      Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.
              SparkListenerSQLExecutionStart =>
            val site = s.details.linesIterator
              .find(l => l.contains("graft.") && !l.contains("ProfGate"))
              .map(_.trim).getOrElse(s.description.take(90))
            execSite.put(s.executionId, site)
            ()
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // first graft frame of the stage's call stack — the engine
        // call site that launched the job
        val det = js.stageInfos.headOption.map(_.details).getOrElse("")
        val site = det.linesIterator.find(l => l.contains("graft.") &&
            !l.contains("ProfGate")).map(_.trim)
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(id => Option(execSite.get(id.toLong)))
            .map("@ " + _))
          .getOrElse(
            if (sys.env.contains("PROF_DETAILS"))
              "? " + det.linesIterator.take(6).mkString(" | ")
            else "?")
        starts.put(js.jobId, (System.nanoTime(), site))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null)
          done.add((je.jobId, (System.nanoTime() - s._1) / 1e9, s._2, s._1))
        ()
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    import scala.jdk.CollectionConverters._
    val jobs = done.asScala.toSeq
    println(f"PROF $name%s wall=$wall%.3f s, jobs=${jobs.size}%d, " +
      f"jobTime=${jobs.map(_._2).sum}%.3f s")
    // timeline with the DRIVER GAP before each job — the between-jobs
    // driver work (FS ops, analysis, commit rendering) is usually the
    // half of the wall the job view cannot see
    val tl = jobs.sortBy(_._4)
    var prevEnd = t0
    println("TIMELINE (gap = driver-side time since previous job end):")
    tl.foreach { case (id, secs, site, st) =>
      val gap = (st - prevEnd) / 1e9
      val flag = if (gap > 0.05) " <== gap" else ""
      println(f"  job $id%4d  gap=$gap%7.3f s  run=$secs%7.3f s$flag  $site%s")
      prevEnd = math.max(prevEnd, st + (secs * 1e9).toLong)
    }
    println(f"  tail gap=${(t0 + (wall * 1e9).toLong - prevEnd) / 1e9}%.3f s")
    println("BY SITE (job run time + following gap attribution):")
    jobs.groupBy(_._3).view.mapValues(js => (js.size, js.map(_._2).sum))
      .toSeq.sortBy(-_._2._2).take(20).foreach { case (site, (n, secs)) =>
        println(f"  $secs%7.3f s  n=$n%3d  $site%s")
      }
    spark.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** REAL contention over the commit log: concurrent writers racing on
  * the same table from multiple threads. The r13 slot claim
  * (`claimVersionSlot`: hard link on local paths — genuinely atomic
  * create-if-absent, where POSIX rename would silently REPLACE) is the
  * mechanism under test; with the old screen+rename a race in the
  * window could clobber the winner's commit, which surfaces here as
  * lost rows or a torn/overwritten version file. */
class CommitRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contended appends: every commit lands exactly once, none lost") {
    val t = Files.createTempDirectory("commitrace").toString + "/t"
    MiniDelta.append(spark, Seq((0L, "seed")).toDF("id", "v"), t, Seq.empty)
    val threads = 4
    val perThread = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (1 to threads).map { th =>
      pool.submit(new Runnable {
        def run(): Unit =
          try (1 to perThread).foreach { i =>
            // blind appends REBASE on a lost slot (retry=true is the
            // append contract) — under the atomic claim every attempt
            // either wins its slot outright or rebases; none clobbers
            MiniDelta.append(spark,
              Seq((th * 1000L + i, s"t$th-$i")).toDF("id", "v"),
              t, Seq.empty)
          } catch { case e: Throwable => errs.add(e); () }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(errs.isEmpty, s"concurrent append failed: ${errs.peek()}")
    MiniDelta.invalidateSnapshot(t)
    // every writer's rows survived — a clobbered commit would lose one
    val rows = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet
    val expected = (for (th <- 1 to threads; i <- 1 to perThread)
      yield th * 1000L + i).toSet + 0L
    assert(rows == expected,
      s"lost commits: missing ${(expected -- rows).toSeq.sorted}")
    // the log is a CONTIGUOUS version chain of fully-written commits
    val logDir = new java.io.File(s"$t/_delta_log")
    val versions = logDir.listFiles().map(_.getName)
      .filter(n => n.endsWith(".json") && n.length == 25)
      .map(_.take(20).toLong).sorted
    assert(versions.toSeq == (0L to versions.max).toSeq,
      s"version chain has holes: ${versions.toSeq}")
    versions.foreach { v =>
      val txt = Files.readString(java.nio.file.Paths.get(
        f"$t/_delta_log/$v%020d.json"))
      assert(txt.contains("\"commitInfo\""), s"torn commit at v=$v")
    }
    // no temp-render debris survived the contention
    val debris = logDir.listFiles().map(_.getName)
      .filter(_.contains(".json.tmp"))
    assert(debris.isEmpty, s"debris: ${debris.toSeq}")
  }
}

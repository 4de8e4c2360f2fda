package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic

/** Bridge to Spark 4's private[sql] `SparkSession.cloneSession` (same
  * pattern as [[DatasetShim]]): a clone shares the SparkContext and
  * cache but carries its OWN SQLConf copy — the lever that lets the
  * engine scope a scan-affecting conf (parquet field-id resolution) to
  * exactly the relations built through the clone, leaving the caller's
  * session untouched.
  */
object SessionBridge {
  def cloneSession(s: SparkSession): SparkSession =
    s.asInstanceOf[classic.SparkSession].cloneSession()

  /** The session's stable identity (classic-only API in Spark 4.1) —
    * cache keys that must not strongly pin the session object. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID

  /** Re-sync a long-lived clone with its caller session, so conf
    * changes (session timeZone, ANSI mode, …) and UDF/temp-function
    * registrations made AFTER the clone was created still apply to
    * frames built through it — same query, same semantics as every
    * other table. `except` keys are the clone's raison d'être (the
    * scoped scan conf) and are never copied or unset.
    *
    * Conf sync diffs the two sessions' EXPLICITLY-SET entries
    * (SQLConf.getAllConfs — defaults never appear, so the diff is tens
    * of keys, not the full conf space) in both directions: caller-set
    * keys copy over, keys the caller unset since the clone are unset in
    * the clone too. Function sync copies registry entries the clone
    * lacks; the builtin set is identical on both sides, so the scan is
    * hash-hits only. Both run per clone USE, not per row — metadata
    * cost. */
  def syncSessionState(from: SparkSession, to: SparkSession,
                       except: Set[String]): Unit = {
    val fc = from.asInstanceOf[classic.SparkSession].sessionState
    val tc = to.asInstanceOf[classic.SparkSession].sessionState
    val fAll = fc.conf.getAllConfs
    val tAll = tc.conf.getAllConfs
    fAll.foreach { case (k, v) =>
      if (!except(k) && !tAll.get(k).contains(v)) tc.conf.setConfString(k, v)
    }
    tAll.keysIterator.foreach { k =>
      if (!except(k) && !fAll.contains(k)) tc.conf.unsetConf(k)
    }
    val fr = fc.functionRegistry
    val tr = tc.functionRegistry
    fr.listFunction.foreach { fn =>
      if (!tr.functionExists(fn))
        for (info <- fr.lookupFunction(fn); b <- fr.lookupFunctionBuilder(fn))
          tr.registerFunction(fn, info, b)
    }
  }
}

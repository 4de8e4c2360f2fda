package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]]
  * (same pattern as [[DatasetShim]]/[[SessionBridge]]): a Hadoop
  * `Configuration` is not `Serializable`, so any executor-side
  * filesystem work (vacuum's distributed delete fan-out) must ship the
  * driver's conf through this wrapper — the exact mechanism every Spark
  * datasource uses for the same problem. The handle is opaque because
  * the wrapped type itself cannot be named outside `org.apache.spark`.
  */
object HadoopConfBridge {
  final class ConfHandle private[HadoopConfBridge] (
      sc: SerializableConfiguration) extends Serializable {
    def conf: Configuration = sc.value
  }

  def handle(conf: Configuration): ConfHandle =
    new ConfHandle(new SerializableConfiguration(conf))
}

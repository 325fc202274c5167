package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** OP-5/OP-36 — the route-command write path (reference:
  * ETLProtocol.route + batch apply, etl_controller.py:503-552, 1784-1812,
  * 3241-3270), re-expressed for Spark's execution model:
  *
  *  - reference serializes ALL commands behind one global lock; the sink
  *    keeps per-device serialization but parallelizes across devices by
  *    partitioning on the device key — one transport per partition
  *  - 0.1 s inter-command spacing (etl_controller.py:1801, 3262) is a
  *    configurable per-partition rate limit
  *  - reply semantics: a reply containing "BAs?" OR silence ⇒ success
  *    (etl_controller.py:543-548)
  *
  * The transport is injectable: [[graft.sources.DeviceTransport]] is the
  * real TCP path (one connection per command, the reference's pattern);
  * tests also use recording stubs and a loopback fixture server.
  *
  * Delivery contract: AT-LEAST-ONCE. Commands are sent inside a
  * transformation whose output feeds a shuffle, so a task retry or stage
  * recomputation (e.g. shuffle-fetch failure) re-executes the partition
  * and resends its commands. The reference device tolerates this — route
  * commands are idempotent (re-routing output o to input i is a no-op)
  * and the reference itself re-applies full route tables on every preset
  * apply (etl_controller.py:3241-3270). Run with
  * `spark.speculation=false` (the default) so duplicates only occur on
  * genuine failures. Transports that implement AutoCloseable are closed
  * when the partition's task completes, success or failure.
  */
object RouteCommandSink {

  /** frame → reply (None = no reply, which still means success). Must be
    * serializable: it ships to executors.
    */
  type Transport = String => Option[String]

  /** Result of one batch apply (OP-30's k/n success count). */
  case class ApplyResult(sent: Long, succeeded: Long)

  def isSuccess(reply: Option[String]): Boolean =
    reply.forall(_.contains("BAs?")) // None ⇒ success; reply must ack

  /** Apply a route table `(device string, output int, input int)`:
    * partition by device (co-locates a device's commands), send frames
    * serially per partition with `spacingMs` between commands, and
    * return the success count per device.
    */
  def applyRoutes(
      routes: DataFrame,
      transportFor: String => Transport,
      spacingMs: Long = 0L): DataFrame = {
    val spark = routes.sparkSession
    import spark.implicits._
    val frames = routes
      .repartition(col("device"))
      .select(col("device"), col("output"), col("input"),
        graft.ops.Protocol.routeFrame(col("output"), col("input")).as("frame"))
    val results = frames.as[(String, Int, Int, String)].mapPartitions { it =>
      val byDevice = scala.collection.mutable.Map.empty[String, Transport]
      // stateful transports (pooled connections, recording stubs) are
      // released when the task ends — success, failure, or cancellation
      Option(org.apache.spark.TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        byDevice.values.foreach {
          case c: AutoCloseable => try c.close() catch { case _: Exception => () }
          case _ => ()
        }
      })
      var first = true
      it.map { case (device, _, _, frame) =>
        if (!first && spacingMs > 0) Thread.sleep(spacingMs)
        first = false
        val transport = byDevice.getOrElseUpdate(device, transportFor(device))
        val ok = try isSuccess(transport(frame)) catch { case _: Exception => false }
        (device, if (ok) 1L else 0L)
      }
    }
    results.toDF("device", "ok")
      .groupBy(col("device"))
      .agg(count(lit(1)).as("sent"), sum(col("ok")).as("succeeded"))
      .orderBy(col("device"))
  }
}

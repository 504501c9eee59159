package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.operators.InjectorOps.InjectorConfig
import graft.streaming.{Probes, StreamingPipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

/** M6 probe semantics (reference src/probes/probes.go + the ES readiness
  * ping): default-false checks, 200/500 answers, and the streaming-query
  * binding that turns a dead stream into an unready pod.
  */
class ProbesSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, route: String): Int = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$route")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(2000)
    conn.setReadTimeout(2000)
    try conn.getResponseCode finally conn.disconnect()
  }

  test("checks default to failing; flips answer 200; flips back 500") {
    val p = new Probes(0)
    val port = p.serve()
    try {
      assert(get(port, "/healthz") == 500)   // default false (probes.go:22-30)
      assert(get(port, "/readiness") == 500)
      p.alive(); p.ready()
      assert(get(port, "/healthz") == 200)
      assert(get(port, "/readiness") == 200)
      p.unready(); p.dead()
      assert(get(port, "/healthz") == 500)
      assert(get(port, "/readiness") == 500)
    } finally p.stop()
  }

  test("a throwing readiness check reads as unready, not a server error") {
    val p = new Probes(0)
    val port = p.serve()
    try {
      p.setReadinessCheck(() => throw new RuntimeException("es down"))
      assert(get(port, "/readiness") == 500)
    } finally p.stop()
  }

  test("bind: ready while the stream runs, unready after it stops") {
    implicit val sqlCtx = spark.sqlContext
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("n", IntegerType)))
    val stream = MemoryStream[Msg]
    stream.addData(Seq(Msg(null, """{"id":"a","n":1}""".getBytes("UTF-8"),
      "my-topic", 0, 1L, Timestamp.valueOf("2024-03-05 10:11:12"), 0)))
    val out = Files.createTempDirectory("graft-probes").toString
    val q = StreamingPipeline.streamingPipeline(
        InjectorConfig(topic = "my-topic"), schema)(stream.toDF())
      .writeStream.format("memory").queryName("probes_out")
      .option("checkpointLocation", s"$out/cp").start()
    val p = new Probes(0)
    val port = p.serve()
    try {
      p.bind(q)
      q.processAllAvailable()
      assert(get(port, "/healthz") == 200)
      assert(get(port, "/readiness") == 200)
      q.stop()
      assert(get(port, "/readiness") == 500) // stopped stream -> recycle pod
      assert(get(port, "/healthz") == 200)   // liveness is a separate switch
    } finally { p.stop(); if (q.isActive) q.stop() }
  }
}

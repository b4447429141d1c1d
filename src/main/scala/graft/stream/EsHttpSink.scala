package graft.stream

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CdcOps

/** The REAL flush (bulk.go:253-315): one micro-batch → LWW dedup →
  * NDJSON encode → split into per-request payloads → POST `/_bulk` over
  * [[EsHttpClient]] — with the response demux running on the ACTUAL
  * `_bulk` response bodies ([[EsBulkResponse.itemErrors]] →
  * [[EsBulkSink.handleResponse]]), which is the part the file sink can
  * only fault-inject.
  *
  * Concurrency model: the payload repartitions to the request split
  * (concurrentRequest, widened by the byte/count flush limits exactly
  * like [[EsBulkSink.writeBatch]]), and each PARTITION posts one `_bulk`
  * from its executor task — in-flight requests = parallel tasks =
  * the reference's concurrentRequest goroutine slots. Item-level errors
  * are tiny by construction (only failures travel) and collect to the
  * driver for the demux broadcast.
  *
  * Failure contract: an item error fails only its item (OnError).
  * A TRANSPORT failure (non-2xx after the client's retry loop, or an
  * exhausted connection retry) throws from the task → the batch fails →
  * Structured Streaming replays it from the checkpoint: at-least-once
  * delivery, replay-collapsed by the LWW dedup and ES's idempotent
  * index-by-id semantics.
  */
object EsHttpSink {

  def postBatch(batch: DataFrame, batchId: Long, http: EsHttpConfig,
      responseHandler: ResponseHandler, concurrentRequest: Int,
      esMajor: Int = 8, typeName: String = "_doc",
      batchByteSizeLimit: Long = 0L, batchSizeLimit: Int = 0): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cached = batch.cache()
    var deduped: DataFrame = null
    try {
      val bad = cached.filter(col("doc_id").isNull || col("index_name").isNull)
      if (!bad.isEmpty) {
        responseHandler.onError(bad, batchId)
      }
      deduped = CdcOps.dedupLastWriteWins(
        cached.filter(col("doc_id").isNotNull && col("index_name").isNotNull))
        .cache()
      val payload =
        (if (esMajor < 8) CdcOps.versionGatedMeta(deduped, lit(esMajor), typeName)
         else CdcOps.ndjsonEncode(deduped))
        .select(concat_ws("\n", col("meta"), col("source")).as("value"))
      val nRequests =
        if (batchByteSizeLimit <= 0L && batchSizeLimit <= 0)
          concurrentRequest
        else {
          val m = payload
            .agg(sum(octet_length(col("value"))), count(lit(1))).collect()(0)
          val totalBytes = if (m.isNullAt(0)) 0L else m.getLong(0)
          val nActions = m.getLong(1)
          val byBytes =
            if (batchByteSizeLimit <= 0L) 1
            else math.ceil(totalBytes.toDouble / batchByteSizeLimit).toInt
          val byCount =
            if (batchSizeLimit <= 0) 1
            else math.ceil(nActions.toDouble / batchSizeLimit).toInt
          math.max(concurrentRequest, math.max(byBytes, byCount))
        }
      // executor-side POST per partition; only item-level FAILURES return
      val errors: Map[String, String] = payload
        .repartition(nRequests)
        .as[String]
        .mapPartitions { lines =>
          if (lines.isEmpty) Iterator.empty
          else {
            // discovery already ran (or was disabled) on the driver-side
            // client; per-task clients just post
            val client = new EsHttpClient(http.copy(discoverNodesOnStart = false))
            try {
              val body = lines.mkString("", "\n", "\n")
              val (status, respBody) = client.bulk(body.getBytes(UTF_8))
              if (status >= 300)
                throw new java.io.IOException(
                  s"_bulk HTTP $status after retries: ${respBody.take(500)}")
              EsBulkResponse.itemErrors(respBody).iterator
            } finally client.close()
          }
        }
        .collect().toMap
      EsBulkSink.handleResponse(deduped, errors, responseHandler, batchId)
      // R3 counters — same at-least-once timing as the file sink
      deduped.groupBy("index_name", "action_type").count()
        .collect()
        .foreach(r => Metrics.record(r.getString(0), r.getString(1), r.getLong(2)))
    } finally {
      if (deduped != null) deduped.unpersist()
      cached.unpersist()
      ()
    }
  }
}

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
  * Concurrency model: the payload splits into EXACT per-request bodies
  * (global ordinals → request ids; the byte/count flush limits widen the
  * request count exactly like [[EsBulkSink.writeBatch]]), and the bodies
  * then spread across at most `concurrentRequest` executor tasks, each
  * posting its bodies sequentially — in-flight requests = tasks = the
  * reference's concurrentRequest goroutine slots, REGARDLESS of how far
  * the flush limits widened the split. Item-level errors are tiny by
  * construction (only failures travel) and collect to the driver for
  * the demux broadcast.
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
      // the WHAT (bad-split → LWW dedup → encode) is shared with the
      // file sink — EsBulkSink.flushPrologue — so the two transports
      // cannot drift on payload contents
      val (d, payload) = EsBulkSink.flushPrologue(cached, batchId,
        responseHandler, esMajor, typeName)
      deduped = d
      val m = payload
        .agg(sum(octet_length(col("value"))), count(lit(1))).collect()(0)
      val totalBytes = if (m.isNullAt(0)) 0L else m.getLong(0)
      val nActions = m.getLong(1)
      val nRequests = EsBulkSink.requestSplit(totalBytes, nActions,
        concurrentRequest, batchByteSizeLimit, batchSizeLimit)
      // Request assembly vs concurrency are SEPARATE dials: the byte/count
      // flush limits can widen nRequests far past the concurrency slots
      // (10k actions / batchSizeLimit=100 → 100 requests), and a
      // one-request-per-partition post would put min(cores, nRequests)
      // simultaneous _bulk calls on the cluster — the very overload the
      // slot count exists to prevent. So: exact request ids via the
      // two-pass global ordinals (round-robin repartition is only
      // APPROXIMATELY even and AQE may coalesce it — either breaks the
      // per-request action bound), one body per request id (in-body line
      // order pinned by ordinal for replay-identical payloads), then the
      // bodies redistribute across at most concurrentRequest tasks, each
      // posting ITS bodies sequentially — in-flight = tasks = the
      // reference's goroutine slots.
      val cap = math.max(1, math.min(concurrentRequest, nRequests))
      val perReq = math.max(1L,
        math.ceil(nActions.toDouble / math.max(1, nRequests)).toLong)
      val (stamped, _) = CdcOps.globalOrdinals(payload, Seq.empty, "event_id")
      val bodies = stamped
        .withColumn("_rid", expr(s"_ord DIV $perReq"))
        .groupBy("_rid")
        .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("_ord").as("o"), col("value").as("v")))),
          x => x.getField("v"))).as("body"))
        .select(col("body")).as[String]
      // only item-level FAILURES return to the driver
      val errors: Map[String, String] = bodies
        .repartition(cap)
        .mapPartitions { bs =>
          if (bs.isEmpty) Iterator.empty
          else {
            // discovery already ran on the driver; `http` carries the
            // discovered node pool (Pipeline.runHttp) so executor tasks
            // spread over the cluster, not just the seed node
            val client = new EsHttpClient(http.copy(discoverNodesOnStart = false))
            val out =
              try bs.flatMap { body =>
                // the bulk API requires the body to end in a newline
                val (status, respBody) = client.bulk((body + "\n").getBytes(UTF_8))
                if (status >= 300)
                  throw new java.io.IOException(
                    s"_bulk HTTP $status after retries: ${respBody.take(500)}")
                EsBulkResponse.itemErrors(respBody)
              }.toVector
              finally client.close()
            out.iterator
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

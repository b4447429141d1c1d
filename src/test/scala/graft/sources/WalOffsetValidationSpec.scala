package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.streaming.ReadLimit

/** Offset-validation unit tests that need the `private[sources]` stream
  * internals (the streaming specs in `graft` cover the public path).
  */
class WalOffsetValidationSpec extends graft.SparkSuite {

  test("planInputPartitions validates the END offset on crash-restart replay") {
    spark // force session init: segments() resolves its FS via SparkSession.active
    val dir = Files.createTempDirectory("wal-endvalidate").toString
    def seg(name: String): Unit = {
      Files.write(Paths.get(dir, name),
        s"""{"event_id":1,"ts":1,"user_id":1,"event_type":"t","value":1.0,"props":"{}"}"""
          .getBytes("UTF-8"))
      ()
    }
    seg("seg-2"); seg("seg-3")
    val stream = new WalMicroBatchStream(dir, None)
    val start = WalOffset(0L, None)
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
      .asInstanceOf[WalOffset]
    assert(end.seg == 2L)
    // sanity: a clean listing replays the committed range fine
    assert(stream.planInputPartitions(start, end).length == 2)
    // 'seg-25' lands during downtime and sorts INSIDE the committed range
    // (seg-2 < seg-25 < seg-3): the start offset (no name at seg 0) cannot
    // catch the shift — only the end name can, and it must fail BEFORE the
    // wrong segment files are read and handed to the sink
    seg("seg-25")
    val ex = intercept[IllegalStateException] {
      stream.planInputPartitions(start, end)
    }
    assert(ex.getMessage.contains("naming contract"))
  }
}

package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.ops.BucketedLayout

/** The persisted bucket-spec sidecar: register() must verify the
  * caller's (key, buckets) against what the writer laid the files out
  * with — a mismatched registration silently mis-buckets every
  * downstream join (round-14 ADVICE).
  */
class BucketedLayoutSpec extends SparkSuite {
  import spark.implicits._

  test("register verifies the persisted _bucket_spec.json") {
    val path = Files.createTempDirectory("blspec").toString + "/t"
    val df = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    BucketedLayout.writeBucketed(df, "bl_spec_w", "doc_id", 4, path)
    assert(BucketedLayout.readSpec(spark, path).contains(("doc_id", 4)))

    // the matching spec re-registers (a fresh serving session)
    BucketedLayout.register(spark, "bl_spec_ok", "doc_id", 4, path)
    assert(spark.table("bl_spec_ok").count() === 100L)

    // wrong bucket count and wrong key both refuse loudly
    val e1 = intercept[IllegalArgumentException] {
      BucketedLayout.register(spark, "bl_spec_bad", "doc_id", 8, path)
    }
    assert(e1.getMessage.contains("_bucket_spec.json"), e1.getMessage)
    intercept[IllegalArgumentException] {
      BucketedLayout.register(spark, "bl_spec_bad2", "text", 4, path)
    }

    // a pre-sidecar artifact (no spec file) registers as before:
    // trust the caller, as the docstring documents
    val p = new Path(path, "_bucket_spec.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
    BucketedLayout.register(spark, "bl_spec_legacy", "doc_id", 4, path)
    assert(spark.table("bl_spec_legacy").count() === 100L)
  }
}

package graft

import graft.sources.ObjectStorageSource
import graft.sources.ObjectStorageSource.{AzureOptions, S3Options}

class ObjectStorageSourceSpec extends SparkFunSuite {

  test("s3 table function maps to the fs.s3a option surface") {
    val m = ObjectStorageSource.hadoopConf(S3Options(
      url = "s3a://corpus/docs/dt=*/part-*.parquet",
      accessKey = "AK", secretKey = "SK",
      sessionToken = Some("TOK"),
      endpoint = Some("https://minio.internal:9000"),
      region = Some("us-east-1"),
      pathStyleAccess = true))
    assert(m("fs.s3a.access.key") == "AK" && m("fs.s3a.secret.key") == "SK")
    assert(m("fs.s3a.session.token") == "TOK")
    assert(m("fs.s3a.endpoint") == "https://minio.internal:9000")
    assert(m("fs.s3a.endpoint.region") == "us-east-1")
    // S3-compatible endpoints (MinIO) need path-style addressing
    assert(m("fs.s3a.path.style.access") == "true")
    // rename-free commit: no copy-on-commit storm at 100 TB job end
    assert(m("fs.s3a.committer.name") == "magic")
  }

  test("anonymous s3 access swaps in the anonymous credentials provider") {
    val m = ObjectStorageSource.hadoopConf(S3Options(
      url = "s3a://public-bucket/x.parquet", anonymous = true))
    assert(m("fs.s3a.aws.credentials.provider").contains("Anonymous"))
  }

  test("azure account key scopes to the account's abfs domain") {
    val m = ObjectStorageSource.hadoopConf(
      AzureOptions("abfss://data@acct.dfs.core.windows.net/t", "acct", "KEY"))
    assert(m("fs.azure.account.key.acct.dfs.core.windows.net") == "KEY")
  }

  test("reader wires format + partition-discovery options without resolving a store") {
    val r = ObjectStorageSource.reader(SparkTestBase.spark,
      ObjectStorageSource.hadoopConf(S3Options("s3a://b/p", "a", "s")),
      format = "parquet", hivePartitioning = true,
      basePath = Some("s3a://b/p"))
    // construction must not touch the (absent) connector; .load() would
    assert(r != null)
    val opts = ObjectStorageSource.readerOptions("parquet",
      hivePartitioning = true, basePath = Some("s3a://b/p"))
    // hive layout prunes at LIST time via partition discovery — recursive
    // lookup (which disables it) must be off
    assert(opts("recursiveFileLookup") == "false")
    assert(opts("basePath") == "s3a://b/p")
  }

  test("hdfs url builder") {
    assert(ObjectStorageSource.hdfsUrl("nn:9000", "/warehouse/lineitem/*.parquet")
      == "hdfs://nn:9000/warehouse/lineitem/*.parquet")
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Io, Tables}

class IoSpec extends GraftSpecBase {

  test("csv and json round-trip preserves values; partitioned parquet prunes") {
    initLog()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "n_chars")
    val base = Files.createTempDirectory("graft_io").toString

    Io.writeCsv(docs, s"$base/csv")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val csvBack = Io.readCsv(spark, s"$base/csv", schema)
    assert(csvBack.count() == docs.count())
    assert(csvBack.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))

    Io.writeJsonLines(docs, s"$base/json")
    assert(Io.readJsonLines(spark, s"$base/json", schema).count() == docs.count())

    Io.writeOrc(docs, s"$base/orc")
    val orcBack = Io.readOrc(spark, s"$base/orc")
    assert(orcBack.agg(sum("n_chars")).head.getLong(0) ==
      docs.agg(sum("n_chars")).head.getLong(0))
    // predicate pushdown works on ORC too
    val plan = orcBack.filter(col("doc_id") === 7).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id)"), plan.take(400))

    // partition pruning: only the lang=en directory is scanned
    Io.writeParquet(docs, s"$base/pq", partitionCols = Seq("lang"))
    val pruned = Io.readParquet(spark, s"$base/pq").filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan.take(600))
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }

  test("malformed csv rows degrade to nulls, not failures") {
    initLog()
    val base = Files.createTempDirectory("graft_io_bad").toString
    Files.write(java.nio.file.Paths.get(base, "bad.csv"),
      "doc_id,lang,n_chars\n1,en,10\nnot_a_number,xx,oops\n".getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val df = Io.readCsv(spark, base, schema)
    assert(df.count() == 2)
    assert(df.filter(col("doc_id").isNull).count() == 1)
  }
}

package graft.sources

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The corpus-writer layout contract: deterministic split/shard/order,
  * one writer task per output directory, bounded file sizes. */
class CorpusWriterSpec extends SparkSpec {
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.001"

  private def listParquet(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  test("corpus write: layout, determinism, round trip, file-size bound") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val out = Files.createTempDirectory("graft-corpus").toString
    CorpusWriter.write(docs, out, numShards = 4, maxRecordsPerFile = 40)

    // layout: split=*/shard=* directories, nothing else at the top
    val splits = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(splits == Set("split=train", "split=val", "split=test"))

    // round trip: exact same documents, split/shard survive as
    // partition columns and match the assignment rules recomputed
    val back = CorpusWriter.read(spark, out)
    assert(back.count() == docs.count())
    val mismatched = back
      .withColumn("esplit", TF.splitAssign(col("doc_id")))
      .withColumn("eshard",
        (TF.hash60(col("doc_id").cast("string")) % 4).cast("int"))
      .filter(col("split") =!= col("esplit") ||
        col("shard").cast("int") =!= col("eshard"))
    assert(mismatched.isEmpty)

    // file-size bound: no file exceeds maxRecordsPerFile rows
    val perFile = back.groupBy(input_file_name()).count()
      .as[(String, Long)].collect()
    assert(perFile.nonEmpty && perFile.forall(_._2 <= 40))

    // shard-local training order: rows inside each file are laid down
    // in ascending (ord, doc_id) — a sequential read IS the epoch order
    val ordered = back
      .withColumn("f", input_file_name())
      .withColumn("ord",
        TF.hash60(concat(col("doc_id").cast("string"), lit("#ord"))))
      .select("f", "ord", "doc_id")
      .as[(String, Long, Long)].collect().toSeq
      .groupBy(_._1).values
    ordered.foreach { rows =>
      val seq = rows.map(r => (r._2, r._3)).toSeq
      assert(seq == seq.sorted, "file rows not in shard order")
    }

    // determinism: a second write produces identical per-dir counts
    val out2 = Files.createTempDirectory("graft-corpus2").toString
    CorpusWriter.write(docs, out2, numShards = 4, maxRecordsPerFile = 40)
    def dirCounts(d: String) = CorpusWriter.read(spark, d)
      .groupBy("split", "shard").count()
      .as[(String, Int, Long)].collect().toSet
    assert(dirCounts(out) == dirCounts(out2))

    // manifest totals reconcile with the input
    val m = CorpusWriter.manifest(spark, out)
      .as[(String, Int, Long, Long)].collect()
    assert(m.map(_._3).sum == docs.count())
    assert(m.map(_._4).sum ==
      docs.agg(sum("n_chars")).as[Long].head())
  }

  test("corpus write: each output directory is written by exactly one task") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val out = Files.createTempDirectory("graft-corpus1t").toString
    // no maxRecordsPerFile: one task per (split, shard) directory must
    // mean exactly ONE file per directory — the no-small-files claim
    CorpusWriter.write(docs, out, numShards = 4)
    val byDir = listParquet(out).groupBy(_.getParentFile.getPath)
    assert(byDir.nonEmpty)
    byDir.foreach { case (d, fs) =>
      assert(fs.size == 1, s"$d has ${fs.size} files")
    }
  }
}

package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property check for the r3 exact-identity collapse/expand rewrite:
  * on seeded random corpora carrying identical, near-identical, and
  * unrelated docs, the collapsed pipelines must emit EXACTLY the pair
  * set a naive all-pairs computation produces — the collapse is a
  * plan-shape optimization, never a semantics change.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("spark", "shuffle", "parquet", "catalyst", "codegen",
    "partition", "broadcast", "window", "join", "aggregate", "column", "schema")

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    def sentence(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Seq.fill(6)(sentence(12 + rnd.nextInt(8)))
    (1L to 40L).map { i =>
      val b = bases(rnd.nextInt(bases.length))
      val text = rnd.nextInt(4) match {
        case 0 => b // identical group member
        case 1 => b + " " + vocab(rnd.nextInt(vocab.length)) // near dup
        case 2 => b.toUpperCase // identical after normalization
        case _ => sentence(10 + rnd.nextInt(10)) // mostly unrelated
      }
      (i, text)
    }
  }

  test("verifiedDupPairs == naive all-pairs Jaccard on random corpora") {
    for (seed <- Seq(7, 21, 42)) {
      val docs = corpus(seed).toDF("doc_id", "text")
      val sh = Dedup.shingleHashes(docs, "doc_id", "text")
      val ids = docs.select(col("doc_id").as("id_a"))
      val allPairs = ids.crossJoin(docs.select(col("doc_id").as("id_b")))
        .filter(col("id_a") < col("id_b"))
      val naive = Dedup.jaccardFromShingles(sh, "doc_id", allPairs)
        .filter(col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
        .collect().map(_.toSeq).toSet
      val got = Dedup.verifiedDupPairs(docs, "doc_id", "text", threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
        .collect().map(_.toSeq).toSet
      assert(got == naive, s"seed $seed: collapsed pipeline diverged from all-pairs")
      assert(naive.nonEmpty, s"seed $seed: degenerate corpus (no dups generated)")
    }
  }

  test("embeddingNearDups == naive all-pairs cosine on random vectors") {
    for (seed <- Seq(5, 17)) {
      val rnd = new Random(seed)
      def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      val bases = Seq.fill(5)(vec())
      val rows = (1L to 30L).map { i =>
        if (rnd.nextInt(3) == 0) (i, bases(rnd.nextInt(bases.length))) // identical group
        else (i, vec())
      }
      val df = rows.toDF("vec_id", "embedding")
      val a = df.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = df.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      graft.functions.GraftFunctions.register(spark)
      val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .withColumn("cos_sim", call_function("graft_cosine", col("va"), col("vb")))
        .filter(col("cos_sim") >= 0.9)
        .select("id_a", "id_b", "cos_sim")
        .collect().map(_.toSeq).toSet
      // nTables=32 shallow tables: per-pair miss at cos 0.9 is
      // (1 − 0.857²)³² ≈ 4e-19 — candidates provably cover the answer
      val got = Similarity.embeddingNearDups(df, "vec_id", "embedding",
          nPlanes = 2, nTables = 32, threshold = 0.9)
        .select("id_a", "id_b", "cos_sim")
        .collect().map(_.toSeq).toSet
      assert(got == naive, s"seed $seed: collapsed pipeline diverged from all-pairs")
      assert(naive.nonEmpty, s"seed $seed: degenerate corpus (no dups generated)")
    }
  }
}

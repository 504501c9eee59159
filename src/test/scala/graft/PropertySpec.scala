package graft

import graft.operators.{DedupOps, InjectorOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property tests for the engine's delivery/dedup invariants
  * (SURVEY.md §5: "∀ batches: insert twice ≡ insert once").
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(5) // each sample runs Spark jobs

  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("∀ batches: ingesting twice ≡ ingesting once (K2 dedup)") {
    val genBatch = Gen.nonEmptyListOf(for {
      part <- Gen.choose(0, 3)
      off <- Gen.choose(0L, 50L)
    } yield (part, off))
    check(Prop.forAll(genBatch) { rows =>
      val df = rows.toDF("partition", "offset")
        .withColumn("doc_id", concat_ws(":", $"partition", $"offset"))
      val one = InjectorOps.dedupByDocId()(df).count()
      val two = InjectorOps.dedupByDocId()(df.unionAll(df)).count()
      val distinctIds = rows.map { case (p, o) => s"$p:$o" }.distinct.size
      one == distinctIds && two == distinctIds
    })
  }

  test("∀ texts: content hash is whitespace/case-normalization invariant") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val genText = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    check(Prop.forAll(genText) { text =>
      val messy = "  " + text.toUpperCase.replace(" ", "   ") + " "
      val hashes = Seq(text, messy).toDF("text")
        .select(TextOps.contentHash($"text")).as[String].collect()
      hashes(0) == hashes(1)
    })
  }

  test("∀ docs: jaccard(doc, doc) = 1 and minhash sigs equal (LSH sound)") {
    val word = Gen.oneOf("ab", "cd", "ef", "gh", "ij")
    val genDoc = Gen.listOfN(8, word).map(_.mkString(" "))
    check(Prop.forAll(genDoc) { text =>
      val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
      val pairs = DedupOps.minhashLshPairs(k = 2, bands = 4, rows = 2,
        threshold = 0.99)(df)
        .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
      pairs.toSeq == Seq((1L, 2L, 1.0))
    })
  }
}

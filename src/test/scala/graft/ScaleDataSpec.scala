package graft

/** The scale-study corpus generator must actually have the properties
  * PLANS.md's round-4 measurements attribute to it: pure-function
  * determinism, driver-testdata-shaped documents, planted near-dup copies,
  * and unit-norm embeddings.
  */
class ScaleDataSpec extends SparkSpecBase {

  test("generator is a pure function of the id (no RNG state)") {
    assert(ScaleData.docText(123L, 5000L) === ScaleData.docText(123L, 5000L))
    assert(ScaleData.embedding(77L).toSeq === ScaleData.embedding(77L).toSeq)
  }

  test("documents match the driver corpus shape: 10-100 words from the " +
      "30-word vocabulary, ~2.5% dup-marked copies") {
    val n = 4000L
    val texts = (0L until n).map(id => ScaleData.docText(id, n))
    val lens = texts.map(_.split(" ").length)
    assert(lens.min >= 10 && lens.max <= 100)
    val vocab = ScaleData.Vocab.toSet + "dup"
    assert(texts.flatMap(_.split(" ")).forall(vocab.contains))
    val dupDocs = texts.zipWithIndex.filter(_._1.split(" ").contains("dup"))
    assert(dupDocs.size === (n / 40).toInt) // every 40th id is a copy
    // each copy differs from its original by exactly the one swapped word,
    // so the planted pair's shingle Jaccard clears the 0.8 dedup threshold
    dupDocs.foreach { case (t, id) =>
      assert(id % 40 === 39, s"doc $id")
      assert(t.split(" ").count(_ == "dup") === 1)
      // the copy's source is a stored BASE document: exactly one position
      // differs from SOME other doc's stored text (phantom pairs — a copy
      // sourced from another copy's base words — would differ in two)
      val words = t.split(" ")
      val oneAway = texts.zipWithIndex.exists { case (o, oid) =>
        val ow = o.split(" ")
        oid != id && ow.length == words.length &&
          ow.zip(words).count { case (a, b) => a != b } == 1
      }
      assert(oneAway, s"doc $id has no stored one-word-away original")
    }
  }

  test("embeddings are unit-norm 64-dim") {
    (0L until 50L).foreach { id =>
      val e = ScaleData.embedding(id)
      assert(e.length === 64)
      val norm = math.sqrt(e.map(v => v.toDouble * v).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"vec $id norm=$norm")
    }
  }
}

package graft

import graft.text.Bm25

/** BM25 sanity: higher tf wins within one term, rarer terms dominate
  * common ones, document-length normalization demotes padded docs, and a
  * query with no corpus hits returns empty.
  */
class Bm25Spec extends SparkSpec {

  import spark.implicits._

  test("tf monotone and length-normalized") {
    val docs = Seq(
      (1L, "cat cat cat dog fish bird"),
      (2L, "cat dog fish bird wolf bear"),
      // same tf as doc 1 but much longer -> length-normalized below it
      (3L, "cat cat cat " + Seq.fill(40)("filler").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("cat"), k = 3).collect()
    val scores = r.map(x => x.getLong(1) -> x.getDouble(2)).toMap
    // high-tf short doc first; same tf in a much longer doc scores lower
    assert(r.head.getLong(1) == 1L)
    assert(scores(3L) < scores(1L), s"length norm must demote doc 3: $scores")
    assert(scores.keySet == Set(1L, 2L, 3L))
  }

  test("rare term outweighs ubiquitous term") {
    val docs = Seq(
      (1L, "common rare extra pad pad pad"),
      (2L, "common common common pad pad pad"),
      (3L, "common pad other pad pad pad"),
      (4L, "common stuff thing pad pad pad")
    ).toDF("doc_id", "text")
    val r = Bm25.topK(docs, "doc_id", "text", Seq("rare", "common"), k = 4)
      .collect()
    assert(r.head.getLong(1) == 1L, "doc with the rare term must rank first")
  }

  test("no-hit query returns empty") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Bm25.topK(docs, "doc_id", "text", Seq("zzz"), k = 5).count() == 0)
  }
}

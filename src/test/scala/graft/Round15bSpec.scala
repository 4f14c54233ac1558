package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 pins for the embedding near-dup scale route (VERDICT r14
  * #1/#5): the cell-bounded candidate generator that replaces the
  * registry's one O(n²) pair join above the corpus cap.
  */
class Round15bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_a").cast("long"), col("vec_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("dedup_embedding_cosine forceScale branch equals the dedup_embedding_lsh pair set") {
    val routed = pairSet(graft.operators.Ann.dedupEmbeddingCosine(spark, sf, forceScale = true))
    val lsh = pairSet(graft.operators.Ann.dedupEmbeddingLsh(spark, sf))
    assert(routed == lsh, "the above-cap route must BE the oracled cell-bounded scan")
  }

  test("cell-bounded candidates: recall vs the exact pair set, precision on emitted pairs") {
    val exact = pairSet(graft.operators.Ann.dedupEmbeddingCosine(spark, sf))
    val lsh = pairSet(graft.operators.Ann.dedupEmbeddingLsh(spark, sf))
    assert(exact.nonEmpty, "test data must contain near-dup pairs")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"cell-candidate recall $recall below floor (0.8)")
    // precision: every emitted pair really is a near-dup — the verify
    // step is an exact micro-unit cosine, so the only admissible slack
    // vs the float-cosine truth is the 1e-6/dim quantization band
    val e = graft.core.Tables(spark, sf).embeddings
    graft.functions.DotProduct.register(spark)
    graft.functions.UnitVector.register(spark)
    val u = e.select(col("vec_id"),
      call_function("graft_unit", col("embedding")).as("u"))
    val sims = graft.operators.Ann.dedupEmbeddingLsh(spark, sf)
      .join(u.select(col("vec_id").as("vec_a"), col("u").as("ua")), "vec_a")
      .join(u.select(col("vec_id").as("vec_b"), col("u").as("ub")), "vec_b")
      .select(call_function("graft_dot", col("ua"), col("ub")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(_ >= 0.4 - 1e-4),
      s"emitted pair below threshold band: min ${sims.min}")
  }

  test("dedup_embedding_incremental equals the full-corpus pair run restricted to batch×corpus") {
    val isNew: Long => Boolean = id => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val bucket = java.lang.Long.parseLong(
        md.take(2).map("%02x".format(_)).mkString, 16) % 100
      bucket >= 90
    }
    // expected: the oracled full-corpus cell-bounded pairs, keyed by
    // whichever side is in the new batch — batch ∪ corpus equivalence
    val full = pairSet(graft.operators.Ann.dedupEmbeddingLsh(spark, sf))
    val expected = full.toSeq
      .flatMap { case (a, b) =>
        if (isNew(a) && !isNew(b)) Seq(a)
        else if (isNew(b) && !isNew(a)) Seq(b)
        else Nil
      }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val inc = graft.operators.Ann.dedupEmbeddingIncremental(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_corpus_dups"),
        r.getAs[Boolean]("admitted")))
    // every new vector appears exactly once, with the full-run count
    val newIds = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id")).collect().map(_.getLong(0)).filter(isNew).toSet
    assert(inc.map(_._1).toSet == newIds, "screen must cover every batch vector")
    inc.foreach { case (id, n, admitted) =>
      assert(n == expected.getOrElse(id, 0L),
        s"vec $id: incremental count $n != full-run ${expected.getOrElse(id, 0L)}")
      assert(admitted == (n == 0L))
    }
  }

  test("hubness/reciprocity audits conserve the kNN graph's mass") {
    val g = graft.operators.Ann.knnGraph(spark, sf)
    val nEdges = g.count()
    val hub = SparkEntry.queries("embedding_hubness_audit")(spark, sf).collect()
    val nVec = graft.core.Tables(spark, sf).embeddings.count()
    assert(hub.map(_.getAs[Long]("n_vectors")).sum == nVec,
      "in-degree histogram must partition the corpus")
    assert(hub.map(r => r.getAs[Long]("in_degree") * r.getAs[Long]("n_vectors")).sum
      == nEdges, "sum of in-degrees must equal the edge count")
    val rr = SparkEntry.queries("knn_reciprocal_rate")(spark, sf).collect().head
    assert(rr.getAs[Long]("n_edges") == nEdges)
    assert(rr.getAs[Long]("n_reciprocal") >= 0 &&
      rr.getAs[Long]("n_reciprocal") <= nEdges)
    assert(rr.getAs[Long]("n_reciprocal") % 2 == 0,
      "reciprocal directed edges come in pairs")
    // srp occupancy: each of the 8 tables partitions the corpus
    val occ = SparkEntry.queries("srp_bucket_occupancy")(spark, sf).collect()
    assert(occ.length == 8)
    occ.foreach { r =>
      assert(r.getAs[Long]("max_occupancy") <= nVec)
      assert(r.getAs[Long]("n_buckets") <= 16L) // 4 planes -> <=16 buckets
    }
    // keep-canonical: survivors = corpus - (clustered non-representatives)
    val clusters = SparkEntry.queries("dedup_embedding_clusters")(spark, sf).collect()
    val droppedN = clusters.count(r => r.getLong(0) != r.getLong(1))
    val kept = SparkEntry.queries("embedding_keep_canonical")(spark, sf).count()
    assert(kept == nVec - droppedN)
  }

  test("dedup_embedding_clusters inherits the routing: scale-branch pairs cluster consistently") {
    // below the cap (test scale) the clusters form over the EXACT pair
    // set — pin that the registered query still does exactly that
    val viaExact = graft.operators.Dedup.labelPropagate(
      graft.operators.Ann.dedupEmbeddingCosine(spark, sf)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val registered = SparkEntry.queries("dedup_embedding_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(registered == viaExact)
  }
}

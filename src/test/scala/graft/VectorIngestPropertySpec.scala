package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Anti-drift property pin between the two vector-admission faces
  * (round 16, VERDICT r15 #5): across RANDOM batch splits, arrival
  * orders, and replay injections, the streaming sink's final state
  * must agree with the batch cell relation everywhere the two are
  * defined to agree.
  *
  * The exact contract (not naive equality): the batch operator
  * screens new vectors against the OLD corpus only, while the sink
  * accumulates — an admitted new vector becomes state and can block
  * a LATER near-dup new vector. So across any split/order:
  *   A. a batch-rejected vector (verified spanning near-dup to old)
  *      is rejected by the sink in EVERY split/order — old state is
  *      present from batch 0 and old×new candidates are
  *      order-independent;
  *   B. sink-admitted ⊆ batch-admitted (the sink screens against a
  *      superset of the old corpus), and the divergence set is
  *      CONFINED to vectors with a verified new×new near-dup — on
  *      every vector without one, the verdicts are EQUAL in every
  *      order;
  *   C. replaying any batch at any point leaves state unchanged
  *      (id-keyed insert, old wins).
  */
class VectorIngestPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("random splits/orders/replays: sink state brackets the batch relation") {
    import graft.streaming.VectorIngestSink
    val rnd = new scala.util.Random(20260816L)
    val vectors = graft.core.Tables(spark, sf).embeddings
      .select(col("vec_id"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("embedding"))
    val allIds = vectors.select("vec_id").collect().map(_.getLong(0)).sorted
    val oldIds = allIds.filter(_ % 2 == 0).toSet
    val newIds = allIds.filter(_ % 2 == 1)
    // ground truth from the batch family's verified pair relation
    // (same quantizer, same probes, same τ as the sink installs)
    val pairs = graft.operators.Ann.cellNearDupPairs(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val spanningRejected = pairs.collect {
      case (a, b) if (a % 2 == 0) != (b % 2 == 0) => if (a % 2 == 1) a else b
    }.toSet
    val newNewInvolved = pairs.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 1 => Seq(a, b)
    }.flatten.toSet
    val batchAdmitted = newIds.toSet -- spanningRejected
    val cents = graft.operators.Ann.kmeansAssign(spark, sf)._3

    for (trial <- 1 to 3) {
      val st = java.nio.file.Files.createTempDirectory(s"vec_prop_$trial").toString
      VectorIngestSink.installQuantizer(cents, st)
      VectorIngestSink.applyBatch(
        vectors.filter(col("vec_id") % 2 === 0), st)
      assert(VectorIngestSink.currentCorpus(spark, st).count() == oldIds.size)
      // random partition of the new ids into 1..4 batches, random order
      val shuffled = rnd.shuffle(newIds.toSeq)
      val nBatches = 1 + rnd.nextInt(4)
      val batches = shuffled.zipWithIndex
        .groupBy(_._2 % nBatches).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      batches.foreach { ids =>
        val frame = vectors.filter(col("vec_id").isInCollection(ids))
        VectorIngestSink.applyBatch(frame, st)
        if (rnd.nextBoolean()) {
          val before = VectorIngestSink.currentCorpus(spark, st)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          VectorIngestSink.applyBatch(frame, st) // replay injection
          val after = VectorIngestSink.currentCorpus(spark, st)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          assert(after == before, s"trial $trial: replay changed state")
        }
      }
      val stateIds = VectorIngestSink.currentCorpus(spark, st)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(oldIds.subsetOf(stateIds), s"trial $trial: old corpus must persist")
      val sinkAdmitted = stateIds -- oldIds
      // A: a batch-rejected vector is rejected in every split/order
      assert((sinkAdmitted & spanningRejected).isEmpty,
        s"trial $trial ($nBatches batches): sink admitted batch-rejected " +
          s"${(sinkAdmitted & spanningRejected).toSeq.sorted.take(5)}")
      // B: sink ⊆ batch, divergence confined to new×new-involved
      assert(sinkAdmitted.subsetOf(batchAdmitted),
        s"trial $trial: sink admitted beyond the batch relation")
      val diverged = batchAdmitted -- sinkAdmitted
      assert(diverged.subsetOf(newNewInvolved),
        s"trial $trial: order-divergence outside the new×new set: " +
          s"${(diverged -- newNewInvolved).toSeq.sorted.take(5)}")
    }
  }
}

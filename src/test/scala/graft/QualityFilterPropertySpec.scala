package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-17 property pin (VERDICT r16 #5): the distilled quality
  * filter is the one operator whose output is a TRAINED artifact
  * rather than a closed-form query, so its guarantees are pinned the
  * way VectorIngestPropertySpec pins the streaming vector sink —
  * against GENERATED corpora with controlled properties, not just the
  * shipped test tables:
  *
  *  1. on a cleanly separable corpus the 20-step training converges
  *     to a SEPARATING logit — the kept/rejected logit distributions
  *     pull apart and the admit boundary lands between them (a
  *     20-step full-batch learner is deliberately NOT pinned to
  *     perfect classification: on the shipped corpus it reads 0.79 vs
  *     0.38 admit rates, a calibrated score, not a re-derived rule) —
  *     across random corpus draws;
  *  2. under controlled teacher-label noise the training stays
  *     numerically sane (finite logits inside ExactExp's domain) and
  *     keeps separating the CLEAN majority;
  *  3. the eval sweep's confusion cells equal a brute-force confusion
  *     computed driver-side from the scored rows at every operating
  *     point.
  *
  * The teacher rule (TextAnalysis.qualityFilter): keep iff
  * tokens ≥ 30 AND dup-3-gram ratio < 0.05 AND stopword ratio ≥ 0.05.
  */
class QualityFilterPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val T = graft.operators.TextAnalysis

  /** A corpus with `nKeep` clearly-keepable docs (40–120 distinct
    * tokens, ~1-in-6 stopwords, no repeated trigrams) and `nDrop`
    * clearly-rejectable ones (a rotating mix of too-short /
    * all-repeated-trigrams / zero-stopword shapes). Seeded — each
    * draw is deterministic.
    */
  private def corpus(seed: Long, nKeep: Int, nDrop: Int) = {
    val rnd = new scala.util.Random(seed)
    val stops = Seq("the", "a", "of", "and", "to", "is")
    def keepDoc(id: Long): (Long, String) = {
      val n = 40 + rnd.nextInt(81)
      val toks = (0 until n).map { j =>
        if (j % 6 == 0) stops(rnd.nextInt(stops.length))
        else s"w${id}x$j" // distinct per position: trigrams never repeat
      }
      (id, toks.mkString(" "))
    }
    def dropDoc(id: Long): (Long, String) = (id, (id % 3) match {
      case 0 => (0 until (3 + rnd.nextInt(10))).map(j => s"s$j").mkString(" ") // too short
      case 1 => Seq.fill(20)("spam ham eggs").mkString(" ") // dup trigrams, no stopwords
      case _ => (0 until 60).map(j => s"q${id}y$j").mkString(" ") // long but zero stopwords
    })
    val rows = (0 until nKeep).map(i => keepDoc(i.toLong)) ++
      (0 until nDrop).map(i => dropDoc((nKeep + i).toLong))
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  private def featuresOf(docs: org.apache.spark.sql.DataFrame) =
    T.lrFeaturesOf(T.qualityRuleSignalsOf(docs), withLabel = true)

  test("clean corpora: 20-step training converges to a separating logit (3 draws)") {
    for (seed <- Seq(7L, 21L, 99L)) {
      val feat = featuresOf(corpus(seed, nKeep = 120, nDrop = 120)).cache()
      val kept = feat.filter(col("y") === 1.0).count()
      assert(kept >= 100, s"seed $seed: generator must produce mostly-keepable keep docs ($kept)")
      assert(feat.filter(col("y") === 0.0).count() >= 100,
        s"seed $seed: generator must produce rejectable docs")
      val scored = T.scoreQuality(feat, T.trainQualityModel(feat))
        .select(col("y"), col("logit")).collect()
      feat.unpersist()
      val keptLogits = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
      val dropLogits = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
      val meanKept = keptLogits.sum / keptLogits.length
      val meanDrop = dropLogits.sum / dropLogits.length
      assert(meanKept - meanDrop >= 0.3,
        s"seed $seed: the logit distributions must pull apart " +
          s"(mean kept $meanKept vs mean dropped $meanDrop)")
      val keptAdmit = keptLogits.count(_ >= 0.0).toDouble / keptLogits.length
      val dropAdmit = dropLogits.count(_ >= 0.0).toDouble / dropLogits.length
      assert(keptAdmit - dropAdmit >= 0.5,
        s"seed $seed: the admit boundary must separate the verdict classes " +
          s"(kept admit rate $keptAdmit vs dropped admit rate $dropAdmit)")
    }
  }

  test("label noise: training stays finite and separates the clean majority") {
    val feat = featuresOf(corpus(1234L, nKeep = 150, nDrop = 150)).cache()
    for (noisePct <- Seq(10, 30)) {
      // seeded, rate-controlled label flips — the y the trainer sees
      val noisy = feat.withColumn("flip",
          pmod(xxhash64(col("doc_id"), lit(noisePct)), lit(100)) < noisePct)
        .withColumn("y_clean", col("y"))
        .withColumn("y", when(col("flip"), lit(1.0) - col("y")).otherwise(col("y")))
      val flipped = noisy.filter(col("flip")).count().toDouble / 300.0
      assert(math.abs(flipped - noisePct / 100.0) < 0.08,
        s"flip rate must track the dial ($flipped vs $noisePct%)")
      val scored = T.scoreQuality(noisy, T.trainQualityModel(noisy))
        .select(col("y_clean"), col("flip"), col("logit")).collect()
      assert(scored.forall(r => !r.getDouble(2).isNaN && math.abs(r.getDouble(2)) <= 40.0),
        s"$noisePct% noise: every logit finite and inside ExactExp's |x| <= 40 domain")
      val clean = scored.filter(!_.getBoolean(1))
      val cleanKept = clean.filter(_.getDouble(0) == 1.0).map(_.getDouble(2))
      val cleanDrop = clean.filter(_.getDouble(0) == 0.0).map(_.getDouble(2))
      val keptAdmit = cleanKept.count(_ >= 0.0).toDouble / cleanKept.length
      val dropAdmit = cleanDrop.count(_ >= 0.0).toDouble / cleanDrop.length
      assert(keptAdmit - dropAdmit >= 0.5,
        s"$noisePct% noise: the model must still separate the clean majority " +
          s"(clean-kept admit $keptAdmit vs clean-dropped admit $dropAdmit)")
    }
    feat.unpersist()
  }

  test("eval sweep confusion cells == brute-force confusion from the scored rows") {
    val dir = "/root/testdata/sf0.01"
    val scored = T.qualityLogregFilter(spark, dir)
      .select(col("doc_id"), col("label_kept"), col("logit")).collect()
    val evalRows = T.qualityLogregEval(spark, dir).collect()
    assert(evalRows.length == 5, "five operating points")
    evalRows.foreach { r =>
      val th = r.getAs[Double]("threshold")
      val tp = scored.count(s => s.getDouble(1) == 1.0 && s.getDouble(2) >= th).toLong
      val fp = scored.count(s => s.getDouble(1) == 0.0 && s.getDouble(2) >= th).toLong
      val fn = scored.count(s => s.getDouble(1) == 1.0 && s.getDouble(2) < th).toLong
      val tn = scored.count(s => s.getDouble(1) == 0.0 && s.getDouble(2) < th).toLong
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp &&
        r.getAs[Long]("fn") == fn && r.getAs[Long]("tn") == tn,
        s"threshold $th: eval cells must equal the brute-force confusion " +
          s"(${r.getAs[Long]("tp")}/${r.getAs[Long]("fp")}/${r.getAs[Long]("fn")}/${r.getAs[Long]("tn")} vs $tp/$fp/$fn/$tn)")
    }
  }
}

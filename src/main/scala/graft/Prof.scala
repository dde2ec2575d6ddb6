package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage profiler (guide §1: measure first). Times named
  * sub-pipelines of a query under investigation via the noop sink,
  * min/median over SPARK_GRAFT_TIME runs (default 3). The stage list is
  * edited in place per investigation — this is measurement scaffolding,
  * not a stable surface.
  *
  * Usage: graft.Prof <sfDir> <profile>
  */
object Prof {
  def noop(df: DataFrame): Double = {
    val t0 = System.nanoTime
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val profile = args.lift(1).getOrElse("q118")
    val runs = sys.env.get("SPARK_GRAFT_TIME").map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages: Seq[(String, () => DataFrame)] = profile match {
      case "q118" =>
        import graft.ops.Multimodal
        def samples = Tables.load(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), expr(Multimodal.audioSamplesSpark).as("px"))
        def media = Multimodal.encodeWavPcm16(spark, samples)
        def decoded = Multimodal.decodeAudioWindows(spark, media)
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q118_audio_fingerprint_neardup")(spark, dir)),
          "synth" -> (() => samples),
          "synth+enc" -> (() => media),
          "synth+enc+dec" -> (() => decoded),
          "pairs-only(from-dec)" -> (() => Multimodal.phashPairs(decoded,
            Multimodal.AudioFpMaxHamming))
        )
      case "q118enc" =>
        import graft.ops.Multimodal
        def samples = Tables.load(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), expr(Multimodal.audioSamplesSpark).as("px"))
        def mediaDirect = {
          import spark.implicits._
          samples.as[Multimodal.PxRow].mapPartitions { rows =>
            val writer = {
              val it = java.util.ServiceLoader
                .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
                .iterator()
              var w: javax.sound.sampled.spi.AudioFileWriter = null
              while (it.hasNext && w == null) {
                val c = it.next()
                if (c.isFileTypeSupported(
                    javax.sound.sampled.AudioFileFormat.Type.WAVE)) w = c
              }
              w
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
              true, false)
            rows.map { r =>
              val n = r.px.length
              val bytes = new Array[Byte](n * 2)
              var i = 0
              while (i < n) {
                val s = r.px(i).toShort
                bytes(2 * i) = s.toByte
                bytes(2 * i + 1) = (s >> 8).toByte
                i += 1
              }
              val in = new javax.sound.sampled.AudioInputStream(
                new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
              val bos = new java.io.ByteArrayOutputStream()
              try writer.write(in,
                javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              finally in.close()
              val payload = bos.toByteArray
              Multimodal.MediaRow(r.doc_id, payload, "audio/wav",
                payload.length.toLong)
            }
          }.toDF()
        }
        Seq(
          "enc-audiosystem" -> (() => Multimodal.encodeWavPcm16(spark, samples)),
          "enc-direct" -> (() => mediaDirect),
          "enc-audiosystem2" -> (() => Multimodal.encodeWavPcm16(spark, samples)),
          "enc-direct2" -> (() => mediaDirect)
        )
      case "q102" =>
        import graft.ops.Similarity
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q102_ann_recall")(spark, dir)),
          "ivfTopk" -> (() => Similarity.ivfTopk(spark, dir)),
          "lshTopk" -> (() => Similarity.lshTopk(spark, dir)),
          "pq(cache)" -> (() => Similarity.pqTopkCached(spark, dir)),
          "truth(cache)" -> (() => Similarity.bruteTopkCached(spark, dir)),
          "full2" -> (() =>
            SparkEntry.queries("q102_ann_recall")(spark, dir))
        )
      case "q218" =>
        import graft.ops._
        val w = TextOps.NoveltyWords
        def docs = Tables.load(spark, dir, "documents")
        def grams(df: DataFrame, keep: Seq[String]): DataFrame = df
          .withColumn("words", split(lower(col("text")), " +"))
          .filter(size(col("words")) >= w)
          .select(keep.map(col) :+ explode(expr(
            s"""array_distinct(transform(sequence(0, size(words) - $w),
                i -> md5(concat_ws(' ', slice(words, i + 1, $w)))))"""))
            .as("wkey"): _*)
        def prevG = grams(Snapshot.previousSnapshotText(docs), Seq())
          .distinct().withColumn("seen", lit(1L))
        def currG = grams(
          docs.filter(col("doc_id") % Snapshot.SnapMod =!= Snapshot.RemovedRes)
            .select(col("doc_id"), col("source"), col("text")),
          Seq("doc_id", "source"))
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q218_snapshot_gram_novelty")(spark, dir)),
          "currG" -> (() => currG),
          "prevG(distinct)" -> (() => prevG),
          "full2" -> (() =>
            SparkEntry.queries("q218_snapshot_gram_novelty")(spark, dir))
        )
      case "q93" =>
        import graft.ops.Dedup
        // q93's REAL hash constants (r16 ADVICE: the former hand copies
        // drifted — P was 1000003 against the pipeline's 1000000007 —
        // so the profile measured a different hash family)
        val A93 = Dedup.A
        val B93 = Dedup.B
        val P93 = Dedup.P
        def sh = Dedup.shingleHashesCached(spark, dir)
        def sigs = sh.groupBy(col("doc_id")).agg(
          (A93.zip(B93).zipWithIndex.map { case ((a, b), j) =>
            min(expr(s"(g * $a + $b) % ${P93}L")).as(s"m$j")
          } :+ count(lit(1)).as("n")).head,
          (A93.zip(B93).zipWithIndex.map { case ((a, b), j) =>
            min(expr(s"(g * $a + $b) % ${P93}L")).as(s"m$j")
          } :+ count(lit(1)).as("n")).tail: _*)
        def bands = Dedup.coldBands(sigs.selectExpr(
          Seq("doc_id") ++ (0 until 8).map(j => s"m$j") ++ Seq("n",
            """stack(4, 0, concat_ws(':', m0, m1), 1, concat_ws(':', m2, m3),
                2, concat_ws(':', m4, m5), 3, concat_ws(':', m6, m7))
               AS (band_idx, band_val)"""): _*))
        def pairs = bands.as("x")
          .join(bands.as("y"),
            col("x.band_idx") === col("y.band_idx") &&
              col("x.band_val") === col("y.band_val") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
          .distinct()
        def inter = pairs
          .join(sh.select(col("doc_id").as("da"), col("g")), "da")
          .join(sh.select(col("doc_id").as("db"), col("g")), Seq("db", "g"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("c"))
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q93_minhash_calibration")(spark, dir)),
          "sh(cacheread)" -> (() => sh),
          "sigs" -> (() => sigs),
          "pairs" -> (() => pairs),
          "inter" -> (() => inter),
          "full2" -> (() =>
            SparkEntry.queries("q93_minhash_calibration")(spark, dir))
        )
      case "q144" =>
        import graft.ops.TextOps
        def docs = Tables.load(spark, dir, "documents")
        def toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), " +")).as("term"))
        def qset = {
          import spark.implicits._
          TextOps.BmQueries.flatMap(_._2.split(" ")).distinct.toDF("term")
        }
        def probed = toks.join(broadcast(qset), "term")
        def qtf = probed.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        def dl = docs.select(col("doc_id"),
          size(split(lower(col("text")), " +")).cast("long").as("dl"))
        Seq(
          "full" -> (() => SparkEntry.queries("q144_bm25_retrieval")(spark, dir)),
          "explode" -> (() => toks),
          "explode+probe" -> (() => probed),
          "qtf" -> (() => qtf),
          "dl" -> (() => dl),
          "scored" -> (() => TextOps.bmScoredCandidates(docs, TextOps.BmQueries)),
          "full2" -> (() => SparkEntry.queries("q144_bm25_retrieval")(spark, dir))
        )
      case "q101" =>
        import graft.ops._
        graft.expr.VectorExpressions.register(spark)
        def emb = Tables.load(spark, dir, "embeddings")
        def n = emb.repartition(spark.sparkContext.defaultParallelism)
          .withColumn("de", expr(
            "transform(embedding, x -> cast(x as double))"))
          .withColumn("nrm", expr("sqrt(graft_dot(de, de))"))
          .select(col("vec_id"), col("de"), col("nrm"))
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q101_semantic_dedup_hier")(spark, dir)),
          "n(norm)" -> (() => n),
          "assign(hier)" -> (() => Clustering.assignClusters(emb, 4, 4)),
          "full2" -> (() =>
            SparkEntry.queries("q101_semantic_dedup_hier")(spark, dir))
        )
      case "q117" =>
        import graft.ops._
        def docs = Tables.load(spark, dir, "documents")
        def base = {
          import org.apache.spark.sql.expressions.Window
          val wDup = Window.partitionBy(col("h")).orderBy(col("doc_id"))
          docs.withColumn("h", md5(col("text")))
            .withColumn("quality_score", round(Quality.score(col("text")), 4))
            .withColumn("dup_rank", row_number().over(wDup))
            .select(col("doc_id"), col("source"), col("quality_score"),
              when(col("dup_rank") > 1, 1).otherwise(0).as("is_exact_dup"))
        }
        def evalGrams = TextOps
          .wordShingles(docs.filter(col("source") === "src0"), 4)
          .select(col("s")).distinct()
        def contaminated = TextOps
          .wordShingles(docs.filter(col("source") =!= "src0"), 4)
          .join(broadcast(evalGrams), "s")
          .select(col("doc_id")).distinct()
        def chunkDup = {
          val ch = TextOps.cdcChunksCached(spark, dir)
          val cnt = ch.groupBy(col("chunk_hash"))
            .agg(countDistinct(col("doc_id")).as("nd"))
          ch.join(cnt, "chunk_hash")
            .groupBy(col("doc_id"))
            .agg(sum(col("chunk_tokens")).as("tot"),
              sum(when(col("nd") >= 2, col("chunk_tokens")).otherwise(0L)).as("dup"))
            .filter(col("dup") * 2 >= col("tot"))
            .select(col("doc_id"))
        }
        Seq(
          "full" -> (() =>
            SparkEntry.queries("q117_curation_ledger_full")(spark, dir)),
          "base(quality+dup)" -> (() => base),
          "semDropped" -> (() => Clustering.semanticDedupCached(spark, dir)),
          "contaminated(4gram)" -> (() => contaminated),
          "imgDup" -> (() => Multimodal.phashPairsCached(spark, dir)),
          "decontam" -> (() => Similarity.semanticDecontamCached(spark, dir)),
          "chunkDup" -> (() => chunkDup),
          "spanContam" -> (() => TextOps.contaminationSpansCached(spark, dir)),
          "blocked" -> (() => Scrub.blocklistDocVerdicts(docs)),
          "secretRisk(cached)" -> (() => TextOps.rareTokenRunsCached(spark, dir)
            .filter(col("n_runs") > 0).select(col("doc_id"))),
          "winnowLeak(cached)" -> (() => TextOps.winnowDecontamCached(spark, dir)
            .select(col("doc_id"))),
          "contaminated(cached)" -> (() => TextOps.decontamCountsCached(spark, dir)
            .select(col("doc_id")))
        )
      case "q118dec" =>
        import graft.ops.Multimodal
        import spark.implicits._
        def samples = Tables.load(spark, dir, "documents")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"), expr(Multimodal.audioSamplesSpark).as("px"))
        def media = Multimodal.encodeWavPcm16(spark, samples)
        // timed variant: per-task wall time for the decode loop alone
        def decTimed = {
          media.as[Multimodal.MediaRow].mapPartitions { rows =>
            val t0 = System.nanoTime
            val buf = rows.toArray
            val tMat = System.nanoTime
            val readers = {
              val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
              val it = java.util.ServiceLoader
                .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
              while (it.hasNext) b += it.next()
              b.result()
            }
            val tSl = System.nanoTime
            val out = buf.flatMap { r =>
              try {
                var k = 0
                var in: javax.sound.sampled.AudioInputStream = null
                while (k < readers.length && in == null) {
                  try in = readers(k).getAudioInputStream(
                    new java.io.ByteArrayInputStream(r.payload))
                  catch {
                    case _: javax.sound.sampled.UnsupportedAudioFileException =>
                      k += 1
                  }
                }
                val bytes = in.readAllBytes(); in.close()
                val n = bytes.length / 2
                val nw = n / 16
                val e = new Array[Long](nw)
                var i = 0
                while (i < nw * 16) {
                  val v: Int =
                    ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
                  e(i / 16) += v.toLong * v
                  i += 1
                }
                Some(Multimodal.PxRow(r.doc_id, e))
              } catch { case _: Exception => None }
            }
            val tDec = System.nanoTime
            System.err.println(f"[task] mat ${(tMat - t0) / 1e6}%.0f sl ${(tSl - tMat) / 1e6}%.0f dec ${(tDec - tSl) / 1e6}%.0f ms rows=${buf.length}")
            out.iterator
          }.toDF()
        }
        Seq(
          "dec-timed" -> (() => decTimed),
          "dec-timed2" -> (() => decTimed)
        )
      case "q118raw" =>
        // driver-side tight loop: raw per-clip encode/decode cost without
        // Spark, to separate real codec work from stage overhead
        val n = 5000
        val rnd = new java.util.Random(42)
        val clips = Array.fill(n)(Array.fill(1024)(rnd.nextInt(30000).toLong))
        val writer = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
          var w: javax.sound.sampled.spi.AudioFileWriter = null
          while (it.hasNext && w == null) {
            val c = it.next()
            if (c.isFileTypeSupported(
                javax.sound.sampled.AudioFileFormat.Type.WAVE)) w = c
          }
          w
        }
        val readers = {
          val b = Array.newBuilder[javax.sound.sampled.spi.AudioFileReader]
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
          while (it.hasNext) b += it.next()
          b.result()
        }
        println(s"[prof] readers: ${readers.map(_.getClass.getSimpleName).mkString(",")}")
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        def encodeAll(): Array[Array[Byte]] = clips.map { px =>
          val bytes = new Array[Byte](px.length * 2)
          var i = 0
          while (i < px.length) {
            val s = px(i).toShort
            bytes(2 * i) = s.toByte; bytes(2 * i + 1) = (s >> 8).toByte
            i += 1
          }
          val in = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, px.length.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          try writer.write(in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          finally in.close()
          bos.toByteArray
        }
        def decodeAll(payloads: Array[Array[Byte]]): Long = {
          var acc = 0L
          payloads.foreach { p =>
            var k = 0
            var in: javax.sound.sampled.AudioInputStream = null
            while (k < readers.length && in == null) {
              try in = readers(k).getAudioInputStream(
                new java.io.ByteArrayInputStream(p))
              catch { case _: javax.sound.sampled.UnsupportedAudioFileException => k += 1 }
            }
            val bytes = in.readAllBytes(); in.close()
            acc += bytes.length
          }
          acc
        }
        (1 to 3).foreach { r =>
          var t0 = System.nanoTime
          val ps = encodeAll()
          val tEnc = (System.nanoTime - t0) / 1e6
          t0 = System.nanoTime
          val acc = decodeAll(ps)
          val tDec = (System.nanoTime - t0) / 1e6
          println(f"[prof] raw run $r: enc $tEnc%.0f ms, dec $tDec%.0f ms (acc=$acc)")
        }
        Seq.empty
      case other =>
        sys.error(s"unknown profile $other")
    }

    stages.foreach { case (label, mk) =>
      spark.sparkContext.setJobDescription(s"prof:$profile:$label")
      val times = (1 to runs).map(_ => noop(mk()))
      println(f"[prof] $label%-24s ${times.map(x => f"$x%7.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

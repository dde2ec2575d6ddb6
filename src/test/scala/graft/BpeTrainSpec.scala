package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** q100's trainer at a REALISTIC merge budget: the round-6 formulation
  * re-nested the greedy fold expression once per round, so a user turning
  * TrainMerges up toward a real 1k-32k vocabulary hit analyzer/Janino
  * depth walls long before any data-size wall. The reworked
  * [[graft.ops.TextOps.trainBpe]] materializes the tokenization each
  * round (one fold deep per round, always); this spec runs it to 64
  * merges on a toy vocabulary and pins the full merge sequence bitwise
  * against an in-memory reference trainer. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference BPE: same argmax tie-break (cnt DESC, then pair ASC) and
    * same left-associative greedy merge pass as the Spark fold. */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : Seq[(Int, String, String, String, Long)] = {
    def greedy(v: Vector[String], ta: String, tb: String): Vector[String] = {
      val acc = mutable.ArrayBuffer.empty[String]
      v.foreach { t =>
        if (acc.nonEmpty && acc.last == ta && t == tb) {
          acc.remove(acc.length - 1); acc += (ta + tb)
        } else acc += t
      }
      acc.toVector
    }
    // distinct words → distinct token vectors (concatenation recovers the
    // word), so a Map keyed by the vector never collides
    var toks: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((v, c) <- toks; i <- 0 until v.length - 1)
        counts((v(i), v(i + 1))) = counts.getOrElse((v(i), v(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((ta, tb), cnt) =
          counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, ta, tb, ta + tb, cnt))
        toks = toks.map { case (v, c) => greedy(v, ta, tb) -> c }
        r += 1
      }
    }
    out.toSeq
  }

  test("64-merge training run matches the reference trainer bitwise (no expression-depth wall)") {
    import spark.implicits._
    // deterministic toy vocabulary over a 5-letter alphabet with skewed
    // weights → long, tie-heavy merge history; the apostrophe word pins
    // the single-quote escaping inside the fold expression
    val rnd = new scala.util.Random(17)
    val alpha = "abcde"
    val words = (0 until 40).map { i =>
      val w = (0 until (4 + rnd.nextInt(8)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + rnd.nextInt(9))
    }.toMap ++ Map("o'er" -> 5L, "don't" -> 3L)
    val vocab = words.toSeq.toDF("word", "wcnt")
    val got = graft.ops.TextOps.trainBpe(vocab, 64)
    val want = refTrain(words, 64)
    assert(got.size == 64, s"vocabulary exhausted early: ${got.size} rounds")
    assert(got == want)
    // later merges really do contain earlier merged tokens (true BPE,
    // not a static table): some merge operand is itself multi-char
    assert(got.exists { case (_, ta, tb, _, _) =>
      ta.length > 1 || tb.length > 1 })
  }

  test("the gated 4-round configuration is unchanged by the rework") {
    import spark.implicits._
    val words = Map("abab" -> 3L, "bab" -> 2L, "ab" -> 7L)
    val vocab = words.toSeq.toDF("word", "wcnt")
    assert(graft.ops.TextOps.trainBpe(vocab, graft.ops.TextOps.TrainMerges)
      == refTrain(words, graft.ops.TextOps.TrainMerges))
  }

  test("driver-local trainer (q103's bounded-vocab path) matches the distributed trainer bitwise") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alpha = "abcde"
    val words = (0 until 40).map { i =>
      val w = (0 until (4 + rnd.nextInt(8)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + rnd.nextInt(9))
    }.toMap ++ Map("o'er" -> 5L, "don't" -> 3L)
    val vocab = words.toSeq.toDF("word", "wcnt")
    val dist = graft.ops.TextOps.trainBpe(vocab, 64)
    val local = graft.ops.TextOps.trainBpeLocal(words.toSeq, 64)
    assert(local == dist)
    assert(local == refTrain(words, 64))
    // exhaustion parity on a vocabulary that runs dry mid-budget
    val tiny = Map("ab" -> 2L, "ba" -> 1L)
    assert(graft.ops.TextOps.trainBpeLocal(tiny.toSeq, 16)
      == refTrain(tiny, 16))
  }
}

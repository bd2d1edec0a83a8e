package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.ops.Dtw

/** W4 properties (SURVEY.md §5): identity on equal lengths
  * (app.py:321-323), output length, warp-path invariants. Property
  * loops use a fixed seed (deterministic; scalacheck bridge is not in
  * the offline cache). */
class DtwSpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def series(): Array[Double] =
    Array.fill(4 + rnd.nextInt(37))(rnd.nextDouble() * 200 - 100)

  test("stretch is identity for equal lengths") {
    val x = Array(1.0, 5.0, 2.0, 9.0)
    assert(Dtw.stretch(x, Array(4.0, 4.0, 4.0, 4.0)).toSeq == x.toSeq)
  }

  test("stretch output has the long series' length") {
    for (_ <- 1 to 50) {
      val a = series(); val b = series()
      val (short, long) = if (a.length <= b.length) (a, b) else (b, a)
      assert(Dtw.stretch(short, long).length == long.length)
    }
  }

  test("warp path is monotonic, connected, and spans both series") {
    for (_ <- 1 to 50) {
      val x = series(); val y = series()
      val (_, path) = Dtw.fastdtw(x, y)
      assert(path.head == ((0, 0)))
      assert(path.last == ((x.length - 1, y.length - 1)))
      path.sliding(2).foreach {
        case Seq((i1, j1), (i2, j2)) =>
          assert((i2 - i1 == 0 || i2 - i1 == 1) && (j2 - j1 == 0 || j2 - j1 == 1))
          assert(i2 - i1 + (j2 - j1) >= 1)
        case _ => ()
      }
    }
  }

  test("fastdtw cost ≥ exact DTW cost; equal on tiny inputs") {
    for (_ <- 1 to 30) {
      val x = series(); val y = series()
      assert(Dtw.fastdtw(x, y)._1 >= Dtw.dtwPath(x, y)._1 - 1e-9)
    }
    val x = Array(1.0, 2.0, 3.0, 4.0)
    val y = Array(1.0, 3.0, 4.0)
    assert(math.abs(Dtw.fastdtw(x, y)._1 - Dtw.dtwPath(x, y)._1) < 1e-12)
  }

  test("every long index appears in the path (stretch is total)") {
    for (_ <- 1 to 30) {
      val a = series(); val b = series()
      val (short, long) = if (a.length <= b.length) (a, b) else (b, a)
      val (_, path) = Dtw.fastdtw(short, long)
      assert(path.map(_._2).distinct.sorted == long.indices.toSeq)
    }
  }
}

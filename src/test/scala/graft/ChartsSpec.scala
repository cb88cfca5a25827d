package graft

import graft.operators.Charts
import org.scalatest.funsuite.AnyFunSuite

/** C15 chart rendering: structural content checks on the decoded pixels
  * (geometry, colors, proportions) rather than glyph-exact bytes — text
  * labels are best-effort on fontless JVMs by design.
  */
class ChartsSpec extends AnyFunSuite {

  private def decode(png: Array[Byte]) =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))

  private def countColor(img: java.awt.image.BufferedImage, rgb: Int): Int = {
    var n = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      if ((img.getRGB(x, y) & 0xFFFFFF) == rgb) n += 1
    n
  }

  private val blue = 0x1f77b4
  private val green = 0x4CAF50
  private val gray = 0xe0e0e0

  test("bar chart: valid PNG, right dimensions, bar heights track scores") {
    val png = Charts.barChartPng(Seq("skills" -> 2.0, "education" -> 8.0))
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = decode(png)
    assert(img.getWidth == 1000 && img.getHeight == 600)
    // the 8.0 bar (right half) must start higher (smaller min-y) and
    // carry ~4x the blue pixels of the 2.0 bar (left half)
    def blueStats(x0: Int, x1: Int): (Int, Int) = {
      var minY = Int.MaxValue; var n = 0
      for (y <- 0 until img.getHeight; x <- x0 until x1)
        if ((img.getRGB(x, y) & 0xFFFFFF) == blue) { n += 1; minY = math.min(minY, y) }
      (minY, n)
    }
    val (yL, nL) = blueStats(0, img.getWidth / 2)
    val (yR, nR) = blueStats(img.getWidth / 2, img.getWidth)
    assert(nL > 0 && nR > 0, "both bars must render")
    assert(yR < yL, "higher score must reach higher")
    assert(math.abs(nR.toDouble / nL - 4.0) < 0.5, s"pixel mass ratio ${nR.toDouble / nL} != ~4")
  }

  test("bar chart: scores clamp to [0,10] and empty input still renders") {
    val img = decode(Charts.barChartPng(Seq("a" -> 25.0, "b" -> -3.0)))
    assert(img.getWidth == 1000)
    assert(decode(Charts.barChartPng(Nil)).getHeight == 600)
  }

  test("donut: wedge areas track the score; hole is white; 0 and 10 degenerate cleanly") {
    val img = decode(Charts.donutChartPng(5.0))
    assert(img.getWidth == 400 && img.getHeight == 160)
    val (g5, r5) = (countColor(img, green), countColor(img, gray))
    assert(g5 > 0 && r5 > 0)
    assert(math.abs(g5.toDouble / r5 - 1.0) < 0.25, s"score 5 should split evenly, got $g5/$r5")
    assert((img.getRGB(200, 80) & 0xFFFFFF) == 0xFFFFFF, "donut hole must be white")
    val full = decode(Charts.donutChartPng(10.0))
    assert(countColor(full, gray) == 0 && countColor(full, green) > 0)
    val empty = decode(Charts.donutChartPng(0.0))
    assert(countColor(empty, green) == 0 && countColor(empty, gray) > 0)
  }

  test("donut labels: every box stays in-canvas; name labels never overlap their pct text") {
    val widthOf = (s: String) => 7 * s.length
    val fontH = 12
    for {
      score <- Seq(0.1, 0.3, 0.5, 1.0, 2.5, 5.0, 7.5, 9.5, 9.9, 0.0, 10.0)
      (w, h) <- Seq((400, 160), (300, 300), (1000, 220), (60, 60))
    } {
      val boxes = Charts.donutLabels(score / 10.0, w, h, widthOf)
      boxes.foreach { case (t, x, y) =>
        assert(x >= 2 && y >= fontH && y <= h - 4,
          s"'$t' out of canvas at ($x,$y) for score=$score ${w}x$h")
        if (w >= widthOf(t) + 4)
          assert(x + widthOf(t) <= w - 2,
            s"'$t' overflows right edge at ($x,$y) for score=$score ${w}x$h")
      }
      // boxes come in (pct, name) pairs per wedge; the name label must
      // not overlap its pct text even when both clamp to the canvas edge
      boxes.grouped(2).foreach {
        case Seq((pt, px, py), (nt, nx, ny)) =>
          val xOverlap = nx < px + widthOf(pt) && px < nx + widthOf(nt)
          assert(!(xOverlap && math.abs(ny - py) < fontH),
            s"'$nt'@($nx,$ny) overlaps '$pt'@($px,$py) for score=$score ${w}x$h")
        case _ =>
      }
    }
  }

  test("renders are deterministic within a JVM") {
    assert(Charts.barChartPng(Seq("x" -> 7.0)).toSeq == Charts.barChartPng(Seq("x" -> 7.0)).toSeq)
    assert(Charts.donutChartPng(7.3).toSeq == Charts.donutChartPng(7.3).toSeq)
  }

  test("column surface: base64 PNG per row for bar and donut") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((7.5, Seq(("skills", 7.0), ("education", 9.0))))
      .toDF("final_score", "scores")
      .select(
        Charts.scoreDonut(col("final_score")).as("donut_b64"),
        Charts.scoreBarChart(col("scores")).as("bar_b64"))
    val row = df.head()
    Seq(row.getString(0), row.getString(1)).foreach { b64 =>
      val bytes = java.util.Base64.getDecoder.decode(b64)
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      assert(this.decode(bytes) != null)
    }
  }
}

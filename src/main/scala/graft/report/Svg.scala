package graft.report

import java.util.Locale

/** Dependency-free, byte-deterministic SVG chart primitives — the
  * rendering half of the S13 plot sink (SURVEY §2.1). The reference
  * writes ~40 plotly figures (`scripts/clean_beta_scan.py:151-366`,
  * `scripts/time_resolution_beta_scan.py:69-116,290-360`,
  * `scripts/compare_measurements.py:236-338`); this module renders the
  * SAME figure families from the engine's already-aggregated plot tables
  * (histogram bins A7, ECDF points A8, fitted-curve samples N1/N2, pivot
  * matrices R3) into self-contained SVG: no external fetch of any kind,
  * and every coordinate formatted under `Locale.ROOT` at fixed precision
  * so reports are stable enough to golden-test.
  *
  * Interactivity, matching the plotly hover/zoom the reference relies on:
  * every data mark carries a native SVG `<title>` child (browser hover
  * tooltip — value readout with zero script), and [[HtmlReport.page]]
  * embeds one static pan/zoom script over the figures' `viewBox`. Both
  * are constant byte streams, so determinism is unchanged.
  *
  * Scale note: nothing here touches a DataFrame — inputs are plain Seqs
  * that [[HtmlReport]] produces via a hard-capped collect of plot TABLES
  * (bins / curve samples / summary rows), which are aggregate outputs
  * bounded by construction. Rendering is O(points drawn), never O(corpus).
  */
object Svg {

  /** plotly's default qualitative palette — the public color cycle the
    * reference iterates via `px.colors.qualitative.Plotly`
    * (`scripts/clean_beta_scan.py:169`).
    */
  val Palette: Vector[String] = Vector(
    "#636efa", "#ef553b", "#00cc96", "#ab63fa", "#ffa15a",
    "#19d3f3", "#ff6692", "#b6e880", "#ff97ff", "#fecb52")

  def color(i: Int): String = Palette(math.abs(i) % Palette.length)

  def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  /** Native hover tooltip child for a mark — the plotly hover-label
    * analogue, rendered by browsers with zero script. Empty text renders
    * nothing.
    */
  def tip(text: String): String =
    if (text.isEmpty) "" else s"<title>${esc(text)}</title>"

  /** Pixel coordinates: fixed two decimals, Locale.ROOT — the
    * byte-determinism contract for every geometric attribute.
    */
  def px(v: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(v))

  /** Tick labels: 4 significant digits, trailing zeros trimmed. */
  def label(v: Double): String = {
    if (v == 0.0) return "0"
    val s = String.format(Locale.ROOT, "%.4g", Double.box(v))
    val (mant, suffix) = s.indexOf('e') match {
      case -1 => (s, "")
      case i  => (s.substring(0, i), s.substring(i))
    }
    val trimmed =
      if (mant.contains('.')) mant.replaceAll("0+$", "").stripSuffix(".") else mant
    trimmed + suffix
  }

  /** 1-2-5 nice-step ticks covering [lo, hi]. */
  def ticks(lo: Double, hi: Double, target: Int = 6): Seq[Double] = {
    if (!(hi > lo)) return Seq(lo)
    val raw = (hi - lo) / math.max(target, 2)
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val norm = raw / mag
    val step =
      if (norm < 1.5) mag
      else if (norm < 3.5) 2 * mag
      else if (norm < 7.5) 5 * mag
      else 10 * mag
    val first = math.ceil(lo / step - 1e-9) * step
    Iterator
      .iterate(first)(_ + step)
      .takeWhile(_ <= hi + step * 1e-6)
      .map(v => if (math.abs(v) < step * 1e-9) 0.0 else v)
      .toVector
  }

  /** Data→pixel mapping inside fixed margins. */
  final case class Frame(
      xlo: Double, xhi: Double, ylo: Double, yhi: Double,
      w: Int = 640, h: Int = 400,
      ml: Int = 72, mr: Int = 160, mt: Int = 44, mb: Int = 52) {
    def sx(x: Double): Double = ml + (x - xlo) / (xhi - xlo) * (w - ml - mr)
    def sy(y: Double): Double = h - mb - (y - ylo) / (yhi - ylo) * (h - mt - mb)
  }

  object Frame {
    /** Fit a frame to data extents; degenerate ranges (constant series,
      * empty input) are padded so the scale stays invertible.
      */
    def fit(xs: Seq[Double], ys: Seq[Double], legendRoom: Boolean = true): Frame = {
      def range(vs: Seq[Double], padFrac: Double): (Double, Double) = {
        val fin = vs.filter(v => !v.isNaN && !v.isInfinite)
        if (fin.isEmpty) (0.0, 1.0)
        else {
          val lo = fin.min
          val hi = fin.max
          if (hi > lo) (lo - (hi - lo) * padFrac, hi + (hi - lo) * padFrac)
          else (lo - math.max(1.0, math.abs(lo) * 0.1), hi + math.max(1.0, math.abs(hi) * 0.1))
        }
      }
      val (xl, xh) = range(xs, 0.0)
      val (yl, yh) = range(ys, 0.05)
      Frame(xl, xh, yl, yh, mr = if (legendRoom) 160 else 16)
    }
  }

  /** Wrap rendered marks with background, grid, axes, labels, legend. Tick
    * positions/labels can be overridden for categorical axes (the R3 pivot
    * matrix has string columns).
    */
  def chart(
      f: Frame,
      title: String,
      xLabel: String,
      yLabel: String,
      body: Seq[String],
      legend: Seq[(String, String)] = Nil,
      xTicks: Option[Seq[(Double, String)]] = None,
      yTicks: Option[Seq[(Double, String)]] = None): String = {
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${f.w}" height="${f.h}" viewBox="0 0 ${f.w} ${f.h}" font-family="Helvetica,Arial,sans-serif">"""
    sb ++= s"""<rect width="${f.w}" height="${f.h}" fill="white"/>"""
    val xs = xTicks.getOrElse(ticks(f.xlo, f.xhi).map(t => (t, label(t))))
    val ys = yTicks.getOrElse(ticks(f.ylo, f.yhi).map(t => (t, label(t))))
    for ((t, lbl) <- xs if t >= f.xlo - 1e-12 && t <= f.xhi + 1e-12) {
      val x = px(f.sx(t))
      sb ++= s"""<line x1="$x" y1="${px(f.sy(f.ylo))}" x2="$x" y2="${px(f.sy(f.yhi))}" stroke="#e5e5e5" stroke-width="1"/>"""
      sb ++= s"""<text x="$x" y="${f.h - f.mb + 16}" font-size="11" fill="#444" text-anchor="middle">${esc(lbl)}</text>"""
    }
    for ((t, lbl) <- ys if t >= f.ylo - 1e-12 && t <= f.yhi + 1e-12) {
      val y = px(f.sy(t))
      sb ++= s"""<line x1="${px(f.sx(f.xlo))}" y1="$y" x2="${px(f.sx(f.xhi))}" y2="$y" stroke="#e5e5e5" stroke-width="1"/>"""
      sb ++= s"""<text x="${f.ml - 6}" y="$y" font-size="11" fill="#444" text-anchor="end" dominant-baseline="middle">${esc(lbl)}</text>"""
    }
    sb ++= s"""<rect x="${f.ml}" y="${f.mt}" width="${f.w - f.ml - f.mr}" height="${f.h - f.mt - f.mb}" fill="none" stroke="#999"/>"""
    body.foreach(sb ++= _)
    sb ++= s"""<text x="${f.ml}" y="20" font-size="14" font-weight="bold" fill="#222">${esc(title)}</text>"""
    val xc = px((f.ml + (f.w - f.mr)) / 2.0)
    sb ++= s"""<text x="$xc" y="${f.h - 8}" font-size="12" fill="#222" text-anchor="middle">${esc(xLabel)}</text>"""
    val yc = px((f.mt + (f.h - f.mb)) / 2.0)
    sb ++= s"""<text x="14" y="$yc" font-size="12" fill="#222" text-anchor="middle" transform="rotate(-90 14 $yc)">${esc(yLabel)}</text>"""
    legend.zipWithIndex.foreach { case ((name, c), i) =>
      val y = f.mt + 14 + i * 16
      sb ++= s"""<rect x="${f.w - f.mr + 8}" y="${y - 9}" width="10" height="10" fill="$c"/>"""
      sb ++= s"""<text x="${f.w - f.mr + 22}" y="$y" font-size="11" fill="#222">${esc(name)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Histogram bars from (bin_lo, bin_hi, count) triples, each carrying a
    * bin-range/count hover tooltip.
    */
  def bars(f: Frame, bins: Seq[(Double, Double, Double)], fill: String, opacity: Double = 0.75): String =
    bins.map { case (lo, hi, n) =>
      val x = f.sx(lo)
      val w = math.max(f.sx(hi) - f.sx(lo) - 1.0, 1.0)
      val yTop = f.sy(n)
      val yBase = f.sy(math.max(f.ylo, 0.0))
      val h = math.max(yBase - yTop, 0.0)
      s"""<rect x="${px(x)}" y="${px(yTop)}" width="${px(w)}" height="${px(h)}" fill="$fill" fill-opacity="$opacity">${tip(s"[${label(lo)}, ${label(hi)}): ${label(n)}")}</rect>"""
    }.mkString

  private def finite(p: (Double, Double)): Boolean =
    !p._1.isNaN && !p._1.isInfinite && !p._2.isNaN && !p._2.isInfinite

  /** Connected line through points (pre-sorted by caller); `name`, when
    * given, becomes the series hover tooltip on the stroke.
    */
  def polyline(f: Frame, pts: Seq[(Double, Double)], stroke: String, dash: String = "", width: Double = 1.5, name: String = ""): String = {
    val fin = pts.filter(finite)
    if (fin.isEmpty) return ""
    val d = fin.zipWithIndex.map { case ((x, y), i) =>
      s"${if (i == 0) "M" else "L"}${px(f.sx(x))} ${px(f.sy(y))}"
    }.mkString(" ")
    val dashAttr = if (dash.nonEmpty) s""" stroke-dasharray="$dash"""" else ""
    s"""<path d="$d" fill="none" stroke="$stroke" stroke-width="$width"$dashAttr>${tip(name)}</path>"""
  }

  /** Right-continuous HV step line — the ECDF mark (`px.ecdf`,
    * `scripts/clean_beta_scan.py:212`); `name`, when given, becomes the
    * series hover tooltip on the stroke.
    */
  def steps(f: Frame, pts: Seq[(Double, Double)], stroke: String, width: Double = 1.5, name: String = ""): String = {
    val fin = pts.filter(finite)
    if (fin.isEmpty) return ""
    val sb = new StringBuilder(s"M${px(f.sx(fin.head._1))} ${px(f.sy(fin.head._2))}")
    fin.sliding(2).foreach {
      case Seq((_, y0), (x1, y1)) =>
        sb ++= s" L${px(f.sx(x1))} ${px(f.sy(y0))} L${px(f.sx(x1))} ${px(f.sy(y1))}"
      case _ => ()
    }
    s"""<path d="$sb" fill="none" stroke="$stroke" stroke-width="$width">${tip(name)}</path>"""
  }

  /** Scatter points, each carrying an (x, y) hover tooltip prefixed by
    * `name` when given.
    */
  def dots(f: Frame, pts: Seq[(Double, Double)], fill: String, r: Double = 2.2, opacity: Double = 0.8, name: String = ""): String = {
    val prefix = if (name.isEmpty) "" else s"$name: "
    pts.filter(finite).map { case (x, y) =>
      s"""<circle cx="${px(f.sx(x))}" cy="${px(f.sy(y))}" r="${px(r)}" fill="$fill" fill-opacity="$opacity">${tip(s"$prefix(${label(x)}, ${label(y)})")}</circle>"""
    }.mkString
  }

  /** Vertical marker line with rotated annotation — the cut-line mark
    * (`add_vline` with `annotation_textangle=-90`,
    * `scripts/clean_beta_scan.py:228-236`).
    */
  def vline(f: Frame, x: Double, note: String): String = {
    val xp = px(f.sx(x))
    val yTop = px(f.sy(f.yhi))
    val yBot = px(f.sy(f.ylo))
    val yText = px(f.sy(f.ylo) - 6)
    s"""<line x1="$xp" y1="$yTop" x2="$xp" y2="$yBot" stroke="black" stroke-opacity="0.5" stroke-dasharray="4 3"/>""" +
      s"""<text x="$xp" y="$yText" font-size="10" fill="#222" text-anchor="start" transform="rotate(-90 $xp $yText)">${esc(note)}</text>"""
  }

  /** Vertical error bars with end caps (`error_y`,
    * `scripts/time_resolution_beta_scan.py:290-360` jitter-vs-voltage);
    * each bar group hovers as `y ± e`.
    */
  def errorBars(f: Frame, pts: Seq[(Double, Double, Double)], stroke: String, cap: Double = 3.0, name: String = ""): String = {
    val prefix = if (name.isEmpty) "" else s"$name: "
    pts.filter(p => finite((p._1, p._2)) && !p._3.isNaN && !p._3.isInfinite).map { case (x, y, e) =>
      val xp = px(f.sx(x))
      val y0 = px(f.sy(y - e))
      val y1 = px(f.sy(y + e))
      val xl = px(f.sx(x) - cap)
      val xr = px(f.sx(x) + cap)
      s"""<g>${tip(s"$prefix${label(y)} ± ${label(e)}")}""" +
        s"""<line x1="$xp" y1="$y0" x2="$xp" y2="$y1" stroke="$stroke" stroke-width="1"/>""" +
        s"""<line x1="$xl" y1="$y0" x2="$xr" y2="$y0" stroke="$stroke" stroke-width="1"/>""" +
        s"""<line x1="$xl" y1="$y1" x2="$xr" y2="$y1" stroke="$stroke" stroke-width="1"/></g>"""
    }.mkString
  }

  /** Viridis color stops (public matplotlib colormap), linearly
    * interpolated in RGB — the 2-D histogram / contour fill.
    */
  private val ViridisStops: Vector[(Double, (Int, Int, Int))] = Vector(
    (0.00, (0x44, 0x01, 0x54)),
    (0.25, (0x3b, 0x52, 0x8b)),
    (0.50, (0x21, 0x91, 0x8c)),
    (0.75, (0x5e, 0xc9, 0x62)),
    (1.00, (0xfd, 0xe7, 0x25)))

  def viridis(t0: Double): String = {
    val t = math.min(math.max(if (t0.isNaN) 0.0 else t0, 0.0), 1.0)
    val i = math.min(ViridisStops.indexWhere(_._1 >= t).max(1), ViridisStops.length - 1)
    val (ta, (ra, ga, ba)) = ViridisStops(i - 1)
    val (tb, (rb, gb, bb)) = ViridisStops(i)
    val u = if (tb > ta) (t - ta) / (tb - ta) else 0.0
    def lerp(a: Int, b: Int): Int = math.round(a + (b - a) * u).toInt
    f"#${lerp(ra, rb)}%02x${lerp(ga, gb)}%02x${lerp(ba, bb)}%02x"
  }

  /** Heatmap cells from (xlo, xhi, ylo, yhi, value), colored by value
    * within [vmin, vmax] (`go.Histogram2d`,
    * `scripts/clean_beta_scan.py:330-344`), each hovering its cell extent
    * and value.
    */
  def cells(f: Frame, cs: Seq[(Double, Double, Double, Double, Double)], vmin: Double, vmax: Double): String =
    cs.map { case (xlo, xhi, ylo, yhi, v) =>
      val t = if (vmax > vmin) (v - vmin) / (vmax - vmin) else 0.5
      val x = f.sx(xlo)
      val w = math.max(f.sx(xhi) - f.sx(xlo), 0.5)
      val y = f.sy(yhi)
      val h = math.max(f.sy(ylo) - f.sy(yhi), 0.5)
      s"""<rect x="${px(x)}" y="${px(y)}" width="${px(w)}" height="${px(h)}" fill="${viridis(t)}">${tip(s"x [${label(xlo)}, ${label(xhi)}), y [${label(ylo)}, ${label(yhi)}): ${label(v)}")}</rect>"""
    }.mkString
}

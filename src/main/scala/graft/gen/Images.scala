package graft.gen

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import scala.util.Random

/** Deterministic tiny-image synthesis + codecs + perceptual hash.
  *
  * Offline-safe: only JDK `javax.imageio` codecs (png/bmp/jpg). Images are
  * smooth (sums of low-frequency cosines) so that JPEG q90 re-encodes stay
  * above the PSNR≥40dB fidelity invariant from BASELINE.json `input_hint` —
  * random noise would not survive lossy re-encoding.
  */
object Images {
  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates+deletes a temp file under java.io.tmpdir through a synchronized
  // registry — 32 concurrent decode tasks serialize on it and pay syscalls
  // per image. These images are ≤ a few KB; cache in memory.
  ImageIO.setUseCache(false)

  val Side = 32

  /** Smooth 32×32 RGB image from a seeded RNG: per channel a DC offset plus
    * three random low-frequency cosine waves. Deterministic per seed. */
  def smoothImage(rng: Random): BufferedImage = {
    val img = new BufferedImage(Side, Side, BufferedImage.TYPE_INT_RGB)
    // per-channel: base + 3 cosine terms with freq ≤ 3 cycles per side
    val chans = Array.fill(3) {
      val base = 96 + rng.nextInt(64)
      val terms = Array.fill(3)((
        0.5 + rng.nextDouble() * 2.5,       // fx cycles
        0.5 + rng.nextDouble() * 2.5,       // fy cycles
        rng.nextDouble() * math.Pi * 2,     // phase
        10 + rng.nextDouble() * 18))        // amplitude
      (base, terms)
    }
    var y = 0
    while (y < Side) {
      var x = 0
      while (x < Side) {
        var rgb = 0
        var c = 0
        while (c < 3) {
          val (base, terms) = chans(c)
          var v = base.toDouble
          terms.foreach { case (fx, fy, ph, amp) =>
            v += amp * math.cos(2 * math.Pi * (fx * x + fy * y) / Side + ph)
          }
          val vi = math.max(0, math.min(255, v.round.toInt))
          rgb = (rgb << 8) | vi
          c += 1
        }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    img
  }

  def encode(img: BufferedImage, fmt: String, jpgQuality: Float = 0.9f): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    fmt match {
      case "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpg").next()
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(jpgQuality)
        writer.write(null, new IIOImage(img, null, null), p)
        writer.dispose(); ios.close()
      case f =>
        ImageIO.write(img, f, bos)
    }
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new java.io.ByteArrayInputStream(bytes))

  /** Luma plane as doubles (ITU-R BT.601). */
  def gray(img: BufferedImage): Array[Array[Double]] = {
    val h = img.getHeight; val w = img.getWidth
    val g = Array.ofDim[Double](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
        g(y)(x) = 0.299 * r + 0.587 * gg + 0.114 * b
        x += 1
      }
      y += 1
    }
    g
  }

  /** Classic DCT perceptual hash: gray → (images are already 32×32) →
    * 2-D DCT-II → top-left 8×8 AC coefficients → bit = coeff > median.
    * 64-bit output, bit i = row-major position i of the 8×8 block. */
  def phash(img: BufferedImage): Long = {
    val g = gray(resizeTo(img, Side, Side))
    val n = Side
    // direct 2-D DCT-II of the 8 lowest frequencies in each dimension
    val coef = Array.ofDim[Double](8, 8)
    val cosTab = Array.tabulate(8, n)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) { s += g(y)(x) * cosTab(u)(y) * cosTab(v)(x); x += 1 }
          y += 1
        }
        coef(u)(v) = s
        v += 1
      }
      u += 1
    }
    val flat = coef.flatten
    val ac = flat.drop(1) // exclude DC
    val sorted = ac.sorted
    val median = (sorted(30) + sorted(31)) / 2.0 // median of 63 ACs ~ middle
    var bits = 0L
    var i = 0
    while (i < 64) {
      val v = if (i == 0) 0.0 else flat(i) - median
      if (v > 0) bits |= (1L << i)
      i += 1
    }
    bits
  }

  def resizeTo(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    if (img.getWidth == w && img.getHeight == h) return img
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    g2.drawImage(img.getScaledInstance(w, h, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
    g2.dispose()
    out
  }

  /** Peak signal-to-noise ratio between two decoded images (luma). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "dim mismatch")
    val ga = gray(a); val gb = gray(b)
    var mse = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val d = ga(y)(x) - gb(y)(x); mse += d * d; x += 1
      }
      y += 1
    }
    mse /= (a.getWidth * a.getHeight)
    if (mse == 0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }
}

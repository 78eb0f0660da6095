package graft.gen

/** Dev tool: distribution of pHash Hamming distances for jpg-q90 re-encodes
  * of the synthetic smooth images (drives the blocking-guarantee choice). */
object PhashDistances {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    val dists = (0 until n).map { i =>
      val img = Images.smoothImage(new scala.util.Random(777L + i))
      val jpg = Images.decode(Images.encode(img, "jpg", 0.9f))
      java.lang.Long.bitCount(Images.phash(img) ^ Images.phash(jpg))
    }
    val hist = dists.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (d, xs) => s"$d:${xs.size}" }.mkString(" ")
    println(s"[phash-dist] n=$n max=${dists.max} hist=$hist")
  }
}

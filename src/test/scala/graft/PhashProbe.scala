package graft
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val m = graft.multimodal.Multimodal
    val seeds = (0L until 250L).map(_ * 2)
    val hs = seeds.map(s => m.dHash(m.makePng(s)).get)
    val bright = seeds.map { s =>
      val p = m.makePng(s)
      java.lang.Long.bitCount(m.dHash(p).get ^ m.dHash(m.brightenPng(p, 4)).get)
    }
    println(s"PROBE brightMaxHam=${bright.max} histo=${bright.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
    val minx = (for (i <- hs.indices; j <- i + 1 until hs.size)
      yield java.lang.Long.bitCount(hs(i) ^ hs(j))).min
    println(s"PROBE crossSeedMinHam=$minx distinct=${hs.distinct.size}/250")
  }
}

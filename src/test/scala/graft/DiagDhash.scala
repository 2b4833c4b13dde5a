package graft
import graft.imaging.{PHash, Raster}
object DiagDhash {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/root/reference/testimages/cats")
    val hs = dir.listFiles().sortBy(_.getName).map { f =>
      val img = Raster.decodeFile(f.getPath).toOption.get
      f.getName -> PHash.dhash(img)
    }
    val cat = hs.find(_._1 == "cat.jpg").get._2
    hs.foreach { case (n, (r, c)) =>
      val d = java.lang.Long.bitCount(r ^ cat._1) + java.lang.Long.bitCount(c ^ cat._2)
      println(f"$n%-25s dhashDist(cat)=$d")
    }
    val kit = hs.find(_._1 == "kitten.jpg").get._2
    hs.filter(_._1.contains("kitten")).foreach { case (n, (r, c)) =>
      val d = java.lang.Long.bitCount(r ^ kit._1) + java.lang.Long.bitCount(c ^ kit._2)
      println(f"$n%-25s dhashDist(kitten)=$d")
    }
  }
}

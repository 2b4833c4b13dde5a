package graft

import graft.imaging.{PHash, Raster}

object DiagImages {
  def main(args: Array[String]): Unit = {
    val root = new java.io.File("/root/reference/testimages")
    val files = (root.listFiles().filter(_.isFile) ++
      new java.io.File(root, "cats").listFiles()).sortBy(_.getName)
    val hashes = files.flatMap { f =>
      Raster.decodeFile(f.getPath) match {
        case Right(img) => Some(f.getName -> PHash.dct64(img))
        case Left(e) => println(s"DECODE FAIL ${f.getName}: $e"); None
      }
    }
    hashes.foreach { case (n, h) => println(f"$n%-45s ${h}%016x popcount=${java.lang.Long.bitCount(h)}") }
    println("--- close pairs (d<22):")
    for (i <- hashes.indices; j <- (i + 1) until hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2)
      if (d < 22) println(s"$d  ${hashes(i)._1}  ${hashes(j)._1}")
    }
  }
}

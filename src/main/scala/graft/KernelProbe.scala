package graft

import graft.kernel.Extract
import graft.spark.Synth

/** Dev harness: single-threaded kernel cost per payload kind/size (no Spark). */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val base = "the fast key order sort table scan merge part window small hash scan join order batch stream spark window dup "
    for (rep <- Seq(1, 10, 50, 200)) {
      val text = (base * rep).trim
      val kinds: Seq[(String, Long => Array[Byte])] = Seq(
        ("html", (i: Long) => Synth.buildHtml(i, text)),
        ("pdf ", (i: Long) => Synth.buildPdfDigital(i, text)),
        ("scan", (i: Long) => Synth.buildRaster(i, text, noise = true)))
      for ((label, mk) <- kinds) {
        val n = 500
        val payloads = (0 until n).map(i => mk(i.toLong))
        payloads.foreach(Extract.extract(_, null)) // warm-up
        val t0 = System.nanoTime()
        payloads.foreach(Extract.extract(_, null))
        val sec = (System.nanoTime() - t0) / 1e9
        val bytes = payloads.map(_.length.toLong).sum
        println(f"rep=$rep%3d kind=$label avg=${bytes / n}%7d B  usPerDoc=${sec / n * 1e6}%8.1f  mbPerSec1core=${bytes / 1e6 / sec}%8.1f")
      }
    }
  }
}

package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import graft.kernel.Extract
import graft.spark.Synth

/** Dev harness: raw kernel scaling on a plain thread pool (no Spark) — isolates
  * hardware/memory-bandwidth limits from framework overhead.
  */
object ThreadProbe {
  def main(args: Array[String]): Unit = {
    val text = ("the fast key order sort table scan merge part window small hash " * 20).trim
    val nDocs = 60000
    val payloads = (0 until nDocs).map { i =>
      (Synth.kindSlot(i.toLong) match {
        case m if m <= 12 => Synth.buildHtml(i.toLong, text)
        case 13           => null
        case m if m <= 16 => Synth.buildPdfDigital(i.toLong, text)
        case 17           => Synth.buildRaster(i.toLong, text, noise = true)
        case 18           => Synth.buildPdfScanned(i.toLong, text, noise = true)
        case _            => Synth.buildCorrupt(i.toLong)
      }, text)
    }.toArray
    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = nDocs / threads
      val t0 = System.nanoTime()
      val futures = (0 until threads).map { t =>
        pool.submit(new Callable[Long] {
          def call(): Long = {
            var sum = 0L
            var i = t * chunk
            val end = if (t == threads - 1) nDocs else (t + 1) * chunk
            while (i < end) {
              sum += Extract.extract(payloads(i)._1, payloads(i)._2).text.length
              i += 1
            }
            sum
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }
    run(8) // warm-up
    for (t <- Seq(1, 4, 8, 16, 32)) {
      val s = Seq(run(t), run(t)).min
      println(f"threads=$t%2d sec=$s%6.2f docs_per_sec=${nDocs / s}%9.0f")
    }
  }
}

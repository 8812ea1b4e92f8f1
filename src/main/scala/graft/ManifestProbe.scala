package graft

import java.nio.file.{Files, Paths}
import graft.spark.SnapshotLog

/** Dev harness for the round-4 manifest-list layout: proves append-commit
  * cost is FLAT in table size (O(staged files + commits)), not O(live files).
  * Round 3's format rewrote the full live-file inventory into every snapshot
  * file — O(table) driver work per commit, O(table²) cumulative bytes. Here
  * each commit appends one immutable segment plus a small pointer list, so
  * per-commit wall time and bytes written must stay constant as the table
  * grows from 1k to 100k data files.
  *
  * Stages are synthesized as empty `.parquet` part files (commit never reads
  * data bytes — only the staging listing matters), so the probe isolates pure
  * metadata cost. Results recorded in BASELINE.md.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val dir = Files.createTempDirectory("graft_manifest_probe").toString
    val log = new SnapshotLog(dir)
    val filesPerCommit = 1000
    val commits = 100
    val milestones = Set(1, 2, 5, 10, 20, 50, 75, 100)
    println(f"${"commit#"}%8s ${"tableFiles"}%11s ${"commitMs"}%9s ${"listBytes"}%10s ${"segBytes"}%9s ${"scanListMs"}%11s")
    var id = 0L
    for (c <- 1 to commits) {
      val stage = Paths.get(log.stageDataDir(id))
      var i = 0
      while (i < filesPerCommit) {
        Files.createFile(stage.resolve(f"part-$i%05d.parquet"))
        i += 1
      }
      val t0 = System.nanoTime()
      log.commit(id)
      val commitMs = (System.nanoTime() - t0) / 1e6
      if (milestones(c)) {
        val meta = Paths.get(dir, "meta")
        val listBytes = Files.size(meta.resolve(s"snap-$id.txt"))
        val segBytes = Files.size(meta.resolve(s"seg-$id.txt"))
        val t1 = System.nanoTime()
        val n = log.currentFiles().size
        val scanListMs = (System.nanoTime() - t1) / 1e6
        println(f"$c%8d $n%11d $commitMs%9.1f $listBytes%10d $segBytes%9d $scanListMs%11.1f")
      }
      id += 1
    }
    // cumulative metadata bytes on disk: with sharding this is O(files +
    // commits²·pointer), vs O(files·commits) for the round-3 inline format
    val metaBytes = {
      val s = Files.list(Paths.get(dir, "meta"))
      try s.mapToLong(Files.size(_)).sum finally s.close()
    }
    println(f"total meta bytes: $metaBytes%d (${metaBytes / 1e6}%.2f MB) " +
      f"for ${commits * filesPerCommit}%d files across $commits%d commits")
    // cleanup
    val walk = Files.walk(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally walk.close()
  }
}

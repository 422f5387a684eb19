package graft.core

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest-time artifact staging shared by the text index (TokenIndex) and
  * the vector index (VectorIndex): build a projection ONCE per corpus dir,
  * park it as temp parquet, memoize per JVM, delete at exit.
  *
  * The cache key carries the source parquet's (mtime, size) fingerprint so
  * a rewritten source under the same dir invalidates the staged artifact
  * instead of silently serving stale rows (the fixtures are immutable in
  * practice; this is cheap insurance, not a full catalog).
  */
private[graft] object Staging {

  private val cache = TrieMap.empty[String, String]

  /** Cache key carrying the source parquet's (mtime, size) fingerprint —
    * shared by every per-JVM staging memo (token/vector index here, the
    * q220/q227 merge table in SyncQueries, the unigram piece table) so a
    * restaged source under the same dir invalidates them all the same way. */
  private[graft] def key(dir: String, srcTable: String, name: String): String = {
    def stat(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.map(stat).foldLeft((0L, 0L)) {
          case ((m, sz), (m2, sz2)) => (math.max(m, m2), sz + sz2)
        }
      else (f.lastModified, f.length)
    val (m, sz) = stat(new java.io.File(s"$dir/$srcTable.parquet"))
    s"$dir@$m:$sz#$name"
  }

  /** Memoize a staged DIRECTORY per fingerprinted source: first use
    * creates a temp dir (JVM-exit cleaned) and runs `build` into it;
    * later uses return the same path. The one copy of the
    * TrieMap + createTempDirectory + shutdown-hook pattern — callers
    * (the token/vector index below, SyncQueries' merge table) must not
    * re-implement it. */
  def stagedDir(dir: String, srcTable: String, name: String)
               (build: String => Unit): String =
    cache.getOrElseUpdate(key(dir, srcTable, name), {
      val tmp = Files.createTempDirectory(s"graft_$name").toString
      sys.addShutdownHook(Fs.deleteRecursively(new java.io.File(tmp)))
      build(tmp)
      tmp
    })

  /** Stage `build`'s result as parquet on first use for (dir, name). */
  def staged(s: SparkSession, dir: String, srcTable: String, name: String)
            (build: => DataFrame): DataFrame =
    s.read.parquet(stagedDir(dir, srcTable, name) { tmp =>
      build.write.mode("overwrite").parquet(tmp)
    })
}

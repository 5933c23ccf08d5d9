package graft.operators

import org.apache.spark.sql.DataFrame

/** RELIABLE per-round state checkpointing for iterative algorithms
  * (connected components, PageRank): each round's labels/ranks are cut
  * from their lineage by materializing to checkpoint FILES, not
  * executor blocks.
  *
  * Why not `localCheckpoint(true)`: local checkpoint blocks live on
  * executors and die with them — on a real cluster a long iterative
  * run over 100 TB loses its only copy of the round state on the first
  * executor loss, and the truncated lineage means Spark cannot
  * recompute it (the failure is terminal, not slow). Reliable
  * `checkpoint()` against a (shared at scale: HDFS/S3; local here)
  * checkpoint directory survives any executor loss.
  *
  * The eager-freeing discipline is kept: [[free]] deletes a superseded
  * round's checkpoint files immediately — Spark's own cleaner only
  * removes them on driver GC of the RDD (with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`), which
  * inside a long bench/streaming session is effectively never.
  *
  * Directory resolution, once per session: `spark.graft.checkpointDir`
  * conf, else `GRAFT_CHECKPOINT_DIR` env, else a fresh temp dir. At
  * cluster scale, set the conf to a durable shared filesystem.
  */
object IterCheckpoint {
  /** Eagerly checkpoint one round of iteration state to reliable
    * storage, returning the file-backed DataFrame.
    */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) synchronized {
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption("spark.graft.checkpointDir")
          .orElse(sys.env.get("GRAFT_CHECKPOINT_DIR"))
          .getOrElse(java.nio.file.Files
            .createTempDirectory("graft-ckpt").toString)
        sc.setCheckpointDir(dir)
      }
    }
    df.checkpoint() // eager = true, reliable = true
  }

  /** Free a SUPERSEDED round: drop any cached blocks and delete its
    * checkpoint files. Only call once nothing references the round —
    * i.e. after the next round is eagerly checkpointed and any
    * convergence count over the old state is taken.
    */
  def free(df: DataFrame): Unit =
    org.apache.spark.sql.GraftSql.checkpointRdd(df).foreach { rdd =>
      rdd.unpersist(blocking = false)
      rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
      }
    }
}

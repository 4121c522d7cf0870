package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic swap-in for small standing-state tables that are READ while
  * computing their own replacement (sketch folds, sufficient-statistic
  * accumulators): write the merged state to a temp dir first — the old
  * state stays readable throughout — then delete + rename. A crash at
  * any point leaves either the old state or the new state, never a
  * torn one ([[graft.etl.Gold.upsert]]'s contract, without the keyed
  * merge).
  */
private[graft] object AtomicState {

  def swapIn(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(target)) {
      df.write.mode("overwrite").parquet(path)
    } else {
      val tmp = new org.apache.hadoop.fs.Path(path + ".tmp-swap")
      df.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(target, true)
      fs.rename(tmp, target)
    }
  }
}

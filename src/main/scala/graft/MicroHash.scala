package graft

import org.apache.spark.sql.functions._

/** Dev micro-bench: the portable minhash lane formulas head-to-head in
  * ONE JVM, interleaved — the only regime that survives this host's
  * ambient starvation waves (identical adjacent runs measured 7×
  * apart). `runMain graft.MicroHash [rows] [reps]` prints per-arm
  * wall times for the hex formula (conv(substring(sha2))) vs the
  * digest-byte expression (graft.functions.sha256Lanes) over the same
  * synthetic shingle column with the same vecMin consumer.
  */
object MicroHash {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.harness(cpus)
    import spark.implicits._
    val base = spark.range(rows)
      .select(col("id"),
        concat(lit("tok"), (col("id") % 99991).cast("string"), lit(" w"),
          (col("id") % 1013).cast("string"), lit(" z"),
          (col("id") % 131).cast("string")).as("shingle"))
      .localCheckpoint()
    val hexArm = flatten(transform(
      array((0 until 4).map(g =>
        sha2(concat(lit(s"$g|"), col("shingle")), 256)): _*),
      hex => transform(sequence(lit(0), lit(7)),
        j => conv(hex.substr(j * 8 + 1, lit(8)), 16, 10).cast("long"))))
    val laneArm = flatten(array((0 until 4).map(g =>
      graft.functions.sha256Lanes(concat(lit(s"$g|"), col("shingle")))): _*))
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      // xxhash64 over the lane array folds every element into one long
      // per row — forces full evaluation, no array materialization bias.
      val s = base.select(xxhash64(c).as("x"))
        .agg(expr("bit_xor(x)")).head().getLong(0)
      println(f"[microhash] $name ${(System.nanoTime() - t0) / 1e9}%.2fs (sum=$s)")
    }
    // warm both codegen paths once
    time("warm-hex", hexArm); time("warm-lane", laneArm)
    for (_ <- 1 to reps) { time("hex ", hexArm); time("lane", laneArm) }
    spark.stop()
  }
}

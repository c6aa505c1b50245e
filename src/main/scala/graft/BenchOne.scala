package graft

import java.util.concurrent.atomic.AtomicLong

/** Child-process entry for one scaling measurement: a fresh JVM per
  * parallelism level so GC/heap state cannot leak between the two runs of
  * the N-vs-4N pair (observed: second-session runs in a shared JVM vary
  * 2-3x from heap bloat). Prints exactly one line:
  *   BENCHONE <cpus> <bestSeconds> <turns> <triples> <runSec> <cpuSec> <gcSec>
  * where the trailing three fields are the executor run/cpu/GC totals of
  * the BEST rep (delta-snapshotted around each rep) — the in-artifact
  * evidence of whether a run was compute-bound or stalled (GC, scheduler)
  * during ITS OWN measurement window.
  *
  * Modes (arg 5, default "pipe"):
  *   pipe — full KG-construction pipeline on the fixture
  *   pipejoin — same pipeline with linker=join (the distributed n-gram
  *          dictionary-join mention linker — the path that runs when the
  *          catalog exceeds maxDictEntities, i.e. the 100x-scale fallback)
  *   scan — transcript scan + decode + length aggregation only: measures
  *          the I/O + decompression ceiling of this box, i.e. the upper
  *          bound any scan-dominated job can scale to. The pipeline's
  *          scaling efficiency is judged against THIS, not against an
  *          ideal 4x that single-box memory bandwidth cannot deliver.
  */
object BenchOne {

  /** Cumulative executor stage metrics (ms, ns, ms) via listener. */
  final class StageTotals extends org.apache.spark.scheduler.SparkListener {
    val run = new AtomicLong(0L)  // executorRunTime ms
    val cpu = new AtomicLong(0L)  // executorCpuTime ns
    val gc = new AtomicLong(0L)   // jvmGCTime ms
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      run.addAndGet(m.executorRunTime)
      cpu.addAndGet(m.executorCpuTime)
      gc.addAndGet(m.jvmGCTime)
    }
    def snapshot(): (Long, Long, Long) = (run.get(), cpu.get(), gc.get())
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val fixtureDir = args(1)
    val warmDir = args(2)
    val reps = if (args.length > 3) args(3).toInt else 3
    val mode = if (args.length > 4) args(4) else "pipe"
    val spark = Bench.session(cpus)
    val totals = new StageTotals
    spark.sparkContext.addSparkListener(totals)

    /** Run `body`, return (result, stage run/cpu/gc seconds consumed by it).
      * The listener bus is async: a short settle pause before each snapshot
      * lets completed-stage events drain (diagnostic fields, not gate
      * arithmetic — ms-scale tail loss is acceptable). */
    def metered[A](body: => A): (A, (Double, Double, Double)) = {
      Thread.sleep(300)
      val before = totals.snapshot()
      val r = body
      Thread.sleep(300)
      val after = totals.snapshot()
      (r, ((after._1 - before._1) / 1e3, (after._2 - before._2) / 1e9,
        (after._3 - before._3) / 1e3))
    }

    mode match {
      case "scan" =>
        import org.apache.spark.sql.functions._
        def scanOnce(dir: String): (Double, Long) = {
          val t0 = System.nanoTime()
          val r = spark.read.parquet(s"$dir/transcripts")
            .agg(count(lit(1)), sum(length(col("text")))).head()
          ((System.nanoTime() - t0) / 1e9, r.getLong(0))
        }
        scanOnce(warmDir) // JIT warmup
        val runs = (1 to reps).map(_ => metered(scanOnce(fixtureDir)))
        val best = runs.minBy(_._1._1)
        val (sec, n) = best._1
        val (r, c, g) = best._2
        println(f"BENCHONE $cpus $sec $n 0 $r%.2f $c%.2f $g%.2f")
      case _ =>
        val linker = if (mode == "pipejoin") "join" else "trie"
        Bench.runPipeline(spark, warmDir, linker) // JIT/codegen warmup
        val runs = (1 to reps).map(_ =>
          metered(Bench.runPipeline(spark, fixtureDir, linker)))
        val best = runs.minBy(_._1.seconds)
        val p = best._1
        val (r, c, g) = best._2
        println(f"BENCHONE $cpus ${p.seconds} ${p.turns} ${p.triples} $r%.2f $c%.2f $g%.2f")
    }
    spark.stop()
  }
}

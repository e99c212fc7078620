package graft.tools

/**
 * Direct evidence for the scaling-gate analysis (BENCH/BASELINE.md): measures
 * this box's aggregate DRAM read bandwidth vs thread count with NO Spark, no
 * allocation, no synchronization in the hot loop — each thread repeatedly
 * sums its own private 256 MB long array (pure sequential streaming reads,
 * far beyond any cache). If the aggregate GB/s curve saturates well below
 * 32×single-thread, a memory-bound workload on this single-socket VM cannot
 * scale ≥0.8 from N to 4N threads for any N past the saturation knee — while
 * a real N→4N *executor* scale-out multiplies memory channels with the cores.
 *
 * Usage: sbt "runMain graft.tools.MemBandwidthProbe [threadCounts,...]"
 */
object MemBandwidthProbe {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
                 else Seq(1, 2, 4, 8, 16, 32)
    val wordsPerThread = (256L * 1024 * 1024 / 8).toInt // 256 MB per thread
    val maxThreads = counts.max
    // pre-allocate every array once so GC is idle during measurement
    val arrays = Array.tabulate(maxThreads) { t =>
      val a = new Array[Long](wordsPerThread)
      var i = 0
      while (i < a.length) { a(i) = i * 0x9E3779B97F4A7C15L + t; i += 1 }
      a
    }
    @volatile var sink = 0L

    def sweep(n: Int, passes: Int): Double = {
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        val th = new Thread(() => {
          var p = 0
          var acc = 0L
          while (p < passes) {
            val a = arrays(t)
            var i = 0
            while (i < a.length) { acc += a(i); i += 1 }
            p += 1
          }
          sink += acc
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      n.toDouble * passes * wordsPerThread * 8 / sec / 1e9 // GB/s aggregate
    }

    /** random-access sweep: xorshift-indexed reads over the same private
      * arrays — the access pattern of the superstep's hash probes/aggregates
      * (one cache line fetched per 8 useful bytes, latency-bound). */
    def sweepRandom(n: Int, reads: Int): Double = {
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        val th = new Thread(() => {
          val a = arrays(t)
          val mask = a.length - 1 // wordsPerThread is a power of two
          var x = 0x9E3779B97F4A7C15L + t
          var acc = 0L
          var i = 0
          while (i < reads) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            acc += a((x & Long.MaxValue).toInt & mask)
            i += 1
          }
          sink += acc
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      n.toDouble * reads / sec / 1e6 // M reads/s aggregate
    }

    sweep(2, 1) // warm-up / JIT
    println("sequential: threads,aggregate_GBps,per_thread_GBps")
    val base = counts.map { n =>
      // best of 3 sweeps (external load can only slow a sweep down)
      val gbps = (1 to 3).map(_ => sweep(n, 4)).max
      println(f"$n,$gbps%.2f,${gbps / n}%.2f")
      gbps
    }
    val sat = base.max / base.head
    println(f"sequential saturation: peak aggregate = $sat%.1fx single-thread (ideal ${counts.max}x)")

    sweepRandom(2, 1 << 22) // warm-up
    println("random: threads,aggregate_Mreads_per_s,per_thread_Mreads_per_s")
    val rbase = counts.map { n =>
      val mrps = (1 to 3).map(_ => sweepRandom(n, 1 << 24)).max
      println(f"$n,$mrps%.1f,${mrps / n}%.1f")
      mrps
    }
    val rsat = rbase.max / rbase.head
    println(f"random saturation: peak aggregate = $rsat%.1fx single-thread (ideal ${counts.max}x)")
  }
}

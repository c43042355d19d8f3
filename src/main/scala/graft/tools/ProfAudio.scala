package graft.tools

/** Attribution microbench for the audio-codec gate (q247): times each
  * per-row stage of the encode→decode→stats→downsample→re-decode chain
  * in isolation, single-threaded and at 32 threads, so super-linear or
  * just plain slow readings in SCALING.md's media-codec family can be
  * pinned to a mechanism (SPI provider lock convoy, reject-by-exception
  * provider probing, GC) rather than guessed at. Pure JVM — no Spark —
  * because the question is the per-row byte→value cost itself.
  *
  * Usage: runMain graft.tools.ProfAudio [rowsPerThread] [threads]
  */
object ProfAudio {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val threads = if (args.length > 1) args(1).toInt else 32
    import graft.multimodal.Multimodal.AudioCodec

    def fixture(id: Long): Array[Byte] = {
      val frames = 50 + (id % 200).toInt
      val ch = 1 + (id % 2).toInt
      val v0 = ((id * 7) % 60001 - 30000).toShort
      val v1 = ((id * 11) % 60001 - 30000).toShort
      AudioCodec.encodeWav(frames, 8000,
        if (ch >= 2) Array(v0, v1) else Array(v0))
    }

    // the gate's exact per-row chain
    def gateRow(id: Long): Int = {
      val blob = fixture(id)
      val m = AudioCodec.decodeMeta(blob)
      val means = AudioCodec.channelMeans(blob)
      val pk = AudioCodec.peak(blob)
      val small = AudioCodec.downsample(blob, 4)
      val sm = AudioCodec.decodeMeta(small)
      val smeans = AudioCodec.channelMeans(small)
      m.channels + means.length + pk.intValue() + sm.channels + smeans.length
    }

    def bench(label: String, nThreads: Int)(row: Long => Int): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val sink = new java.util.concurrent.atomic.AtomicLong()
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0L; var acc = 0L
            while (i < rows) { acc += row(t * rows + i); i += 1 }
            sink.addAndGet(acc)
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val totalRows = rows.toLong * nThreads
      println(f"[profaudio] $label%-34s $sec%8.2f s  ${sec * 1e6 / totalRows}%8.2f us/row  (x$nThreads threads, $totalRows rows, sink=${sink.get()})")
    }

    // stage costs, single-threaded first (pure per-row cost), then the
    // full chain at executor thread count (contention shows up as the
    // multi-thread us/row exceeding the single-thread one)
    bench("encode only, 1 thread", 1)(id => fixture(id).length)
    bench("encode+decodeMeta, 1 thread", 1) { id =>
      AudioCodec.decodeMeta(fixture(id)).channels
    }
    bench("full gate chain, 1 thread", 1)(gateRow)
    bench(s"full gate chain, $threads threads", threads)(gateRow)
  }
}

package graft.tools

/** Attribution microbench for the image/video codec gates (q246/q249):
  * times the gates' exact per-row chains — and their encode-only
  * prefixes — at TWO total row counts, so SCALING.md's second-decade
  * ratios (q246 6.43×, q249 8.71× per 10×) can be pinned to flat
  * per-row marginal cost + shrinking fixed cost, by measurement rather
  * than narrative (the q74/q81 counter-run standard). Pure JVM — no
  * Spark — because the question is the per-row byte→value cost itself:
  * if µs/row is flat between the m10-sized and m100-sized runs, the
  * gate-level super-linearity is fixed-cost amortization plus the
  * sitting's GC context, not a scaling defect in the codec chain.
  *
  * The encode-only stages double as the before/after probe for encoder
  * fixed costs (the per-thread ImageWriter cache: `ImageIO.write`
  * walks the writer SPI registry and instantiates a fresh writer per
  * call — the same fixed cost the round-12 reader cache removed from
  * the decode side).
  *
  * Usage: runMain graft.tools.ProfMedia [rowsSmall] [rowsLarge] [threads]
  * Defaults 50000 / 500000 / 32 — the m10/m100 document counts.
  */
object ProfMedia {

  def main(args: Array[String]): Unit = {
    val rowsSmall = if (args.length > 0) args(0).toInt else 50000
    val rowsLarge = if (args.length > 1) args(1).toInt else 500000
    val threads = if (args.length > 2) args(2).toInt else 32
    import graft.multimodal.Mp4Codec
    import graft.multimodal.Multimodal.{ImageCodec, VideoCodec}

    // q246's exact fixture parameterization (MultimodalQueries.q246)
    def imageFixture(id: Long): Array[Byte] =
      ImageCodec.encodePng((8 + id % 25).toInt, (8 + (id * 7) % 25).toInt,
        (id % 256).toInt, ((id * 3) % 256).toInt, ((id * 5) % 256).toInt)

    // q246's exact per-row chain: encode → meta → means → downscale →
    // re-decode meta/means
    def imageRow(id: Long): Int = {
      val blob = imageFixture(id)
      val m = ImageCodec.decodeMeta(blob)
      val means = ImageCodec.channelMeans(blob)
      val small = ImageCodec.downscale(blob, 16)
      val sm = ImageCodec.decodeMeta(small)
      val smeans = ImageCodec.channelMeans(small)
      m.channels + means.length + sm.channels + smeans.length
    }

    // q249's exact fixture parameterization
    def videoFixture(id: Long): Array[Byte] = {
      val nf = (3 + id % 6).toInt
      val cut = if (id % 2 == 0) (1 + id % (nf - 1)).toInt else -1
      val va = (id % 200).toInt
      VideoCodec.encodeSolidAvi(nf, (8 + id % 9).toInt,
        (8 + (id * 3) % 9).toInt, (5 + id % 10).toInt, cut, va, va + 40)
    }

    // q249's exact per-row chain: encode → container meta → per-frame
    // means → decimate transcode → re-parse meta
    def videoRow(id: Long): Int = {
      val blob = videoFixture(id)
      val m = VideoCodec.decodeMeta(blob)
      val means = VideoCodec.frameMeans(blob)
      val small = VideoCodec.decimate(blob, 2)
      val sm = VideoCodec.decodeMeta(small)
      m.nFrames + means.length + sm.nFrames
    }

    // q254's exact fixture parameterization (same shape family as
    // q249's, so the AVI-vs-MP4 µs/row delta is container cost alone)
    def mp4Fixture(id: Long): Array[Byte] = {
      val nf = (3 + id % 6).toInt
      val cut = if (id % 2 == 0) (1 + id % (nf - 1)).toInt else -1
      val va = (id % 200).toInt
      Mp4Codec.encodeSolidMp4(nf, (8 + id % 9).toInt,
        (8 + (id * 3) % 9).toInt, (5 + id % 10).toInt, cut, va, va + 40)
    }

    // q254's exact per-row chain: encode → box-tree meta → per-sample
    // means → decimate transcode → re-parse meta
    def mp4Row(id: Long): Int = {
      val blob = mp4Fixture(id)
      val m = Mp4Codec.decodeMeta(blob)
      val means = Mp4Codec.frameMeans(blob)
      val small = Mp4Codec.decimate(blob, 2)
      val sm = Mp4Codec.decodeMeta(small)
      m.nSamples + means.length + sm.nSamples
    }

    def benchOnce(totalRows: Int)(row: Long => Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val sink = new java.util.concurrent.atomic.AtomicLong()
      // floor at 1 row/thread: totalRows < threads would make per = 0,
      // run zero work, and divide the us/row denominator by 0 (prints
      // NaN). The denominator below uses per*threads, so the remainder
      // rows integer division drops are never billed either way.
      val per = math.max(1, totalRows / threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0L; var acc = 0L
            while (i < per) { acc += row(t.toLong * per + i); i += 1 }
            sink.addAndGet(acc)
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      sec * 1e6 / (per.toLong * threads)
    }

    // median of 3 reps per point, forced GC between reps so each rep
    // starts from the same heap context — a single rep of the SMALL
    // point runs ~1 s and a busy box moves it 2× run-to-run, which is
    // exactly the noise this counter-experiment must not inherit
    def bench(label: String, totalRows: Int)(row: Long => Int): Double = {
      val reps = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(50)
        benchOnce(totalRows)(row)
      }.sorted
      val med = reps(1)
      println(f"[profmedia] $label%-36s $med%8.2f us/row median  " +
        f"(reps ${reps.map(r => f"$r%.1f").mkString("/")}, x$threads threads, $totalRows rows)")
      med
    }

    // warm-up: JIT + codec class init outside any timed window
    bench("warmup image", math.min(rowsSmall, 20000))(imageRow)
    bench("warmup video", math.min(rowsSmall, 20000))(videoRow)
    bench("warmup mp4", math.min(rowsSmall, 20000))(mp4Row)

    // Mechanism A/B for the per-thread ImageWriter cache, alternating
    // inside ONE JVM so ambient box load hits both arms equally (the
    // gate-level before/after drifted 40% between sittings on a busy
    // driver box — including on a gate that never touches ImageIO):
    // encode the same 16×16 image via ImageIO.write (fresh SPI scan +
    // writer per call — the pre-round-13 path) vs a thread-local
    // cached writer (what ImageCodec.encodeVia does now).
    locally {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val wtl = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
        javax.imageio.ImageIO.getImageWritersByFormatName("png").next())
      def fresh(): Int = {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos); bos.size()
      }
      def cached(): Int = {
        val bos = new java.io.ByteArrayOutputStream()
        val w = wtl.get()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        try { w.setOutput(ios); w.write(img) }
        finally { w.setOutput(null); ios.close() }
        bos.size()
      }
      println("[profmedia] --- writer mechanism A/B (alternating, one JVM) ---")
      bench("png write, fresh writer (warm)", rowsSmall)(_ => fresh())
      val a1 = bench("png write, fresh writer", rowsSmall)(_ => fresh())
      val b1 = bench("png write, cached writer", rowsSmall)(_ => cached())
      val a2 = bench("png write, fresh writer (2)", rowsSmall)(_ => fresh())
      val b2 = bench("png write, cached writer (2)", rowsSmall)(_ => cached())
      println(f"[profmedia] writer cache speedup = ${(a1 + a2) / (b1 + b2)}%.2fx " +
        f"(fresh ${(a1 + a2) / 2}%.2f vs cached ${(b1 + b2) / 2}%.2f us/row)")
    }

    // Mechanism A/B for the round-15 streaming decode cursor,
    // alternating inside ONE JVM (the writer-A/B discipline): the
    // EAGER arm materializes every frame copy first and then decodes
    // each copy — the exact shape frameMeans had before the cursor,
    // expressed through the SHIPPED samples()/frames() APIs, which
    // still materialize by definition of their return type; the
    // CURSOR arm is the shipped frameMeans (zero-copy per-frame slice
    // decode). Same pixels, same decode count — the deltas are the
    // per-frame copyOfRange traffic (visible as allocated bytes/row
    // via ThreadMXBean) and the live set between frames (the peak
    // claim itself, which allocation RATE can only witness indirectly:
    // the copies that no longer exist can't be live). 64-frame pattern
    // clips = the q252/q256 row shape, the family's biggest per-row
    // payload.
    locally {
      val tmx = java.lang.management.ManagementFactory.getThreadMXBean
        .asInstanceOf[com.sun.management.ThreadMXBean]
      val pat = 0x5a5a00ff12345601L
      val clipMp4 = Mp4Codec.encodePatternMp4(pat, 8, 8, 10, 200, 40)
      val clipAvi = VideoCodec.encodePatternAvi(pat, 8, 8, 10, 200, 40)
      def eagerMp4(): Double = {
        val fs = Mp4Codec.samples(clipMp4)
        var s = 0.0; var i = 0
        while (i < fs.length) { s += ImageCodec.channelMeans(fs(i))(0); i += 1 }
        s
      }
      def cursorMp4(): Double = {
        val m = Mp4Codec.frameMeans(clipMp4)
        var s = 0.0; var i = 0
        while (i < m.length) { s += m(i); i += 1 }
        s
      }
      def eagerAvi(): Double = {
        val fs = VideoCodec.frames(clipAvi)
        var s = 0.0; var i = 0
        while (i < fs.length) { s += ImageCodec.channelMeans(fs(i))(0); i += 1 }
        s
      }
      def cursorAvi(): Double = {
        val m = VideoCodec.frameMeans(clipAvi)
        var s = 0.0; var i = 0
        while (i < m.length) { s += m(i); i += 1 }
        s
      }
      // single-threaded on purpose: getThreadAllocatedBytes is
      // per-thread, and the cursor's effect is per-row, not contended
      def measure(label: String, rows: Int)(f: () => Double): (Double, Double) = {
        var acc = 0.0; var i = 0
        while (i < 200) { acc += f(); i += 1 } // JIT + reader-cache warm
        System.gc(); Thread.sleep(50)
        val tid = Thread.currentThread.getId
        val a0 = tmx.getThreadAllocatedBytes(tid)
        val t0 = System.nanoTime()
        i = 0
        while (i < rows) { acc += f(); i += 1 }
        val usRow = (System.nanoTime() - t0) / 1e3 / rows
        val kibRow = (tmx.getThreadAllocatedBytes(tid) - a0) / 1024.0 / rows
        println(f"[profmedia] $label%-36s $usRow%8.2f us/row  $kibRow%8.1f KiB-alloc/row" +
          f"  (sink ${acc != 0.0}, $rows rows, 1 thread)")
        (usRow, kibRow)
      }
      println("[profmedia] --- frameMeans cursor A/B (alternating, one JVM) ---")
      val rows = 1500 // 64 ImageIO decodes per row
      measure("mp4 eager (warm)", rows)(eagerMp4)
      val (ea1, eb1) = measure("mp4 eager: samples + decode", rows)(eagerMp4)
      val (ca1, cb1) = measure("mp4 cursor: frameMeans", rows)(cursorMp4)
      val (ea2, eb2) = measure("mp4 eager: samples + decode (2)", rows)(eagerMp4)
      val (ca2, cb2) = measure("mp4 cursor: frameMeans (2)", rows)(cursorMp4)
      println(f"[profmedia] mp4 cursor: time ${(ea1 + ea2) / (ca1 + ca2)}%.2fx, " +
        f"alloc ${(eb1 + eb2) / (cb1 + cb2)}%.2fx vs eager " +
        f"(eager ${(eb1 + eb2) / 2}%.1f vs cursor ${(cb1 + cb2) / 2}%.1f KiB/row)")
      val (va1, vb1) = measure("avi eager: frames + decode", rows)(eagerAvi)
      val (wa1, wb1) = measure("avi cursor: frameMeans", rows)(cursorAvi)
      val (va2, vb2) = measure("avi eager: frames + decode (2)", rows)(eagerAvi)
      val (wa2, wb2) = measure("avi cursor: frameMeans (2)", rows)(cursorAvi)
      println(f"[profmedia] avi cursor: time ${(va1 + va2) / (wa1 + wa2)}%.2fx, " +
        f"alloc ${(vb1 + vb2) / (wb1 + wb2)}%.2fx vs eager " +
        f"(eager ${(vb1 + vb2) / 2}%.1f vs cursor ${(wb1 + wb2) / 2}%.1f KiB/row)")

      // q256's marginal cost over q252: the container-blind dispatch
      // (MediaSniff reads 12 magic bytes, then calls the same walker a
      // direct caller would). Measured, not asserted: sniffed vs
      // direct full chains, alternating. ~1.00× is the expected read.
      import graft.multimodal.MediaSniff
      def sniffAvi(): Double = {
        val m = MediaSniff.frameMeans(clipAvi)
        var s = 0.0; var i = 0
        while (i < m.length) { s += m(i); i += 1 }
        s
      }
      def sniffMp4(): Double = {
        val m = MediaSniff.frameMeans(clipMp4)
        var s = 0.0; var i = 0
        while (i < m.length) { s += m(i); i += 1 }
        s
      }
      val (da1, _) = measure("avi direct: frameMeans", rows)(cursorAvi)
      val (sa1, _) = measure("avi sniffed: MediaSniff", rows)(sniffAvi)
      val (dm1, _) = measure("mp4 direct: frameMeans", rows)(cursorMp4)
      val (sm1, _) = measure("mp4 sniffed: MediaSniff", rows)(sniffMp4)
      val (da2, _) = measure("avi direct: frameMeans (2)", rows)(cursorAvi)
      val (sa2, _) = measure("avi sniffed: MediaSniff (2)", rows)(sniffAvi)
      val (dm2, _) = measure("mp4 direct: frameMeans (2)", rows)(cursorMp4)
      val (sm2, _) = measure("mp4 sniffed: MediaSniff (2)", rows)(sniffMp4)
      println(f"[profmedia] sniff dispatch overhead: avi ${(sa1 + sa2) / (da1 + da2)}%.2fx, " +
        f"mp4 ${(sm1 + sm2) / (dm1 + dm2)}%.2fx vs direct walker calls (q256 vs q252 chain tax)")
      // the chain A/B above bounds the dispatch inside ambient noise
      // (±15–20% on 1,500-row single-thread arms); the sniff ITSELF is
      // deterministic and measured directly — 12 byte compares per call
      locally {
        var acc = 0; var i = 0
        while (i < 1000000) { // warm
          acc += (if (MediaSniff.container(clipAvi) == null) 0 else 1); i += 1
        }
        val t0 = System.nanoTime()
        i = 0
        val calls = 20000000
        while (i < calls) {
          acc += (if (MediaSniff.container(if ((i & 1) == 0) clipAvi else clipMp4) == null) 0 else 1)
          i += 1
        }
        val nsCall = (System.nanoTime() - t0).toDouble / calls
        // percent of chain: nsCall/1000 µs vs mean((dm1,dm2)) µs, ×100
        println(f"[profmedia] sniff container() alone: $nsCall%.1f ns/call " +
          f"(${nsCall / 5.0 / (dm1 + dm2)}%.6f%% of the 64-frame chain; sink ${acc > 0})")
      }
    }

    println("[profmedia] --- encode-only (writer fixed cost) ---")
    bench(s"image encode only, $rowsSmall", rowsSmall)(id => imageFixture(id).length)
    bench(s"video encode only, $rowsSmall", rowsSmall)(id => videoFixture(id).length)

    println("[profmedia] --- full chains, small vs large (marginal-cost flatness) ---")
    val iS = bench(s"image chain, $rowsSmall rows", rowsSmall)(imageRow)
    val iL = bench(s"image chain, $rowsLarge rows", rowsLarge)(imageRow)
    val vS = bench(s"video chain, $rowsSmall rows", rowsSmall)(videoRow)
    val vL = bench(s"video chain, $rowsLarge rows", rowsLarge)(videoRow)
    val mS = bench(s"mp4 chain, $rowsSmall rows", rowsSmall)(mp4Row)
    val mL = bench(s"mp4 chain, $rowsLarge rows", rowsLarge)(mp4Row)
    println(f"[profmedia] image us/row large/small = ${iL / iS}%.2f  " +
      f"video = ${vL / vS}%.2f  mp4 = ${mL / mS}%.2f  " +
      "(flat marginal cost => ~1.0)")
    println(f"[profmedia] mp4/avi container overhead = ${(mS + mL) / (vS + vL)}%.2fx " +
      "(same frame pixels, different container walk)")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Negative control for the bench's `io_read_mb` witness (VERDICT r15
  * next #3): every recorded value at every scale factor has been 0 — the
  * page cache serves all reads on the bench box — so nothing had ever
  * shown the counter CAN fire. An O_DIRECT read bypasses the page cache
  * by contract, so /proc/self/io `read_bytes` (actual block-device reads,
  * the field [[Bench.diskReadBytes]] parses) must move by at least the
  * bytes read. With this green, the 0s elsewhere are evidence of
  * cache-served I/O, not a dead counter. No Spark session needed. */
class IoWitnessSpec extends AnyFunSuite {

  test("io_read_mb witness fires: an O_DIRECT read moves /proc/self/io " +
      "read_bytes by at least the bytes read") {
    val before = Bench.diskReadBytes()
    assume(before >= 0, "/proc/self/io unavailable on this platform")
    val p = java.nio.file.Files.createTempFile("graft-io-probe", ".bin")
    try {
      val payload = new Array[Byte](8 << 20)
      new java.util.Random(42).nextBytes(payload)
      java.nio.file.Files.write(p, payload)
      val bs = math.max(512, java.nio.file.Files.getFileStore(p)
        .getBlockSize.toInt)
      val ch =
        try java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.READ,
          com.sun.nio.file.ExtendedOpenOption.DIRECT)
        catch { case e: UnsupportedOperationException =>
          cancel(s"filesystem does not support O_DIRECT: ${e.getMessage}")
        }
      val b0 = Bench.diskReadBytes()
      try {
        // O_DIRECT needs buffer address, length, and file offset aligned
        // to the logical block size; alignedSlice handles the address,
        // the 1 MiB read unit and the 8 MiB file handle the rest.
        val buf = java.nio.ByteBuffer.allocateDirect((1 << 20) + bs)
          .alignedSlice(bs)
        var total = 0L
        var n = ch.read(buf)
        while (n > 0) { total += n; buf.clear(); n = ch.read(buf) }
        assert(total == (8 << 20).toLong, s"short O_DIRECT read: $total")
      } finally ch.close()
      val delta = Bench.diskReadBytes() - b0
      assert(delta >= (8 << 20).toLong,
        s"read_bytes moved only $delta bytes after an 8 MiB O_DIRECT " +
          "read — the io_read_mb witness would under-report real disk I/O")
    } finally {
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
  }
}

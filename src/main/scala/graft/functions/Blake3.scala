package graft.functions

/** BLAKE3 (unkeyed hash mode), implemented from the public specification
  * (BLAKE3-team/BLAKE3-specs): 1024-byte chunks of 64-byte blocks compressed
  * with 7 rounds of the ChaCha-style G quarter-round, chunk chaining values
  * merged as a binary tree whose left subtree always holds the largest
  * power-of-two number of chunks strictly less than the remaining total.
  *
  * Matches the reference's `blake3` scalar (scalar/string/HashFunctions
  * .java:43) — verified against the digests its test suite pins
  * (HashFunctionsTest.java:42-44), including multi-byte UTF-8 input.
  */
object Blake3 {
  private val IV = Array(
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)
  private val PERM = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

  private final val CHUNK_START = 1
  private final val CHUNK_END = 2
  private final val PARENT = 4
  private final val ROOT = 8
  private final val CHUNK_LEN = 1024
  private final val BLOCK_LEN = 64

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int, mx: Int, my: Int): Unit = {
    v(a) = v(a) + v(b) + mx
    v(d) = Integer.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + my
    v(d) = Integer.rotateRight(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 7)
  }

  /** Full 16-word state after 7 rounds (caller folds it into a CV). */
  private def compress(h: Array[Int], block: Array[Int], counter: Long,
                       blockLen: Int, flags: Int): Array[Int] = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    v(8) = IV(0); v(9) = IV(1); v(10) = IV(2); v(11) = IV(3)
    v(12) = counter.toInt
    v(13) = (counter >>> 32).toInt
    v(14) = blockLen
    v(15) = flags
    var m = block
    var r = 0
    while (r < 7) {
      g(v, 0, 4, 8, 12, m(0), m(1))
      g(v, 1, 5, 9, 13, m(2), m(3))
      g(v, 2, 6, 10, 14, m(4), m(5))
      g(v, 3, 7, 11, 15, m(6), m(7))
      g(v, 0, 5, 10, 15, m(8), m(9))
      g(v, 1, 6, 11, 12, m(10), m(11))
      g(v, 2, 7, 8, 13, m(12), m(13))
      g(v, 3, 4, 9, 14, m(14), m(15))
      r += 1
      if (r < 7) {
        val nm = new Array[Int](16)
        var i = 0
        while (i < 16) { nm(i) = m(PERM(i)); i += 1 }
        m = nm
      }
    }
    v
  }

  private def cv(v: Array[Int]): Array[Int] = {
    val out = new Array[Int](8)
    var i = 0
    while (i < 8) { out(i) = v(i) ^ v(i + 8); i += 1 }
    out
  }

  /** 64-byte block at data[off, off+len) → 16 little-endian words, zero-padded. */
  private def blockWords(data: Array[Byte], off: Int, len: Int): Array[Int] = {
    val m = new Array[Int](16)
    var i = 0
    while (i < len) {
      m(i >> 2) |= (data(off + i) & 0xff) << ((i & 3) << 3)
      i += 1
    }
    m
  }

  /** Chaining value of chunk `chunkIdx` spanning data[off, off+len); len ≤ 1024.
    * An empty input is one chunk of one zero-length block. */
  private def chunkCv(data: Array[Byte], off: Int, len: Int, chunkIdx: Long,
                      root: Boolean): Array[Int] = {
    val nBlocks = math.max(1, (len + BLOCK_LEN - 1) / BLOCK_LEN)
    var h = IV
    var b = 0
    while (b < nBlocks) {
      val bOff = b * BLOCK_LEN
      val bLen = math.min(BLOCK_LEN, len - bOff)
      var flags = 0
      if (b == 0) flags |= CHUNK_START
      if (b == nBlocks - 1) { flags |= CHUNK_END; if (root) flags |= ROOT }
      h = cv(compress(h, blockWords(data, off + bOff, bLen), chunkIdx, bLen, flags))
      b += 1
    }
    h
  }

  private def parentCv(l: Array[Int], r: Array[Int], root: Boolean): Array[Int] = {
    val m = new Array[Int](16)
    System.arraycopy(l, 0, m, 0, 8)
    System.arraycopy(r, 0, m, 8, 8)
    cv(compress(IV, m, 0L, BLOCK_LEN, PARENT | (if (root) ROOT else 0)))
  }

  private def subtreeCv(data: Array[Byte], chunkStart: Int, chunkCount: Int,
                        root: Boolean): Array[Int] =
    if (chunkCount == 1) {
      val off = chunkStart * CHUNK_LEN
      chunkCv(data, off, math.min(CHUNK_LEN, data.length - off), chunkStart.toLong, root)
    } else {
      val left = Integer.highestOneBit(chunkCount - 1)
      parentCv(
        subtreeCv(data, chunkStart, left, root = false),
        subtreeCv(data, chunkStart + left, chunkCount - left, root = false),
        root)
    }

  /** 32-byte digest of the raw bytes. */
  def digest(data: Array[Byte]): Array[Byte] = {
    val nChunks = math.max(1, (data.length + CHUNK_LEN - 1) / CHUNK_LEN)
    val h = subtreeCv(data, 0, nChunks, root = true)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = (h(i >> 2) >>> ((i & 3) << 3)).toByte
      i += 1
    }
    out
  }

  /** Lowercase-hex digest of a string's UTF-8 bytes (the SQL surface). */
  def hexDigest(s: String): String = {
    val d = digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < 32) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }
}

package graft.functions

import java.io.ByteArrayOutputStream

/** Delta + varint (unsigned LEB128) codec for posting lists, plus the
  * block ("restart point") layout used by the index segments.
  *
  * North-rule requirement (BASELINE.json): "merge-sort and
  * delta+varint-compress them into a partitioned index table"; codec is
  * confined to `mapPartitions` / plain Scala — binary packing is not
  * expressible in Catalyst (SURVEY.md §4.3).
  *
  * Layout per posting segment (block size [[BlockSize]] = 128):
  *   - docBlob: per block, the first docID is stored ABSOLUTE (restart
  *     point), the rest as gaps `docID[i] - docID[i-1]` (strictly
  *     increasing lists → gaps ≥ 1). Restart points make each block
  *     independently decodable, enabling O(1) block skip for WAND.
  *   - tfBlob: plain varints.
  *   - block directory (kept as typed columns, not bytes, so Parquet
  *     stats work): blockLastDoc, blockMaxTf, blockMinLen, blockDocOff,
  *     blockTfOff.
  */
object Codec {

  val BlockSize = 128

  // ------------------------------------------------------------- varint

  def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Reads one varint starting at `pos`; returns (value, nextPos). */
  def readVarLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var v = 0L
    var b = 0
    do {
      b = bytes(p) & 0xff
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  // ---------------------------------------------------- whole-list codec

  /** Delta+varint encode a strictly-increasing docID list (single stream,
    * first absolute — the codec primitive; block layout is layered on top
    * by [[encodeBlocks]]). */
  def encodeDeltas(ids: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(ids.length * 2)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      val v = if (i == 0) ids(0) else ids(i) - prev
      writeVarLong(out, v)
      prev = ids(i)
      i += 1
    }
    out.toByteArray
  }

  def decodeDeltas(bytes: Array[Byte], count: Int): Array[Long] = {
    val ids = new Array[Long](count)
    var p = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      val (v, np) = readVarLong(bytes, p)
      prev = if (i == 0) v else prev + v
      ids(i) = prev
      p = np
      i += 1
    }
    ids
  }

  def encodeInts(vs: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(vs.length)
    var i = 0
    while (i < vs.length) { writeVarLong(out, vs(i)); i += 1 }
    out.toByteArray
  }

  def decodeInts(bytes: Array[Byte], count: Int): Array[Long] = {
    val vs = new Array[Long](count)
    var p = 0
    var i = 0
    while (i < count) {
      val (v, np) = readVarLong(bytes, p)
      vs(i) = v; p = np; i += 1
    }
    vs
  }

  /** Encode ONE posting's token positions: varint(count) + delta varints
    * (first absolute) — exactly the per-posting layout of a segment's
    * posBlob, so pre-encoded blobs can ride the build shuffle as compact
    * bytes and be CONCATENATED into posBlob without re-encoding
    * (VERDICT r3 #1: the positional exchange shipped boxed long arrays).
    * Self-contained: the delta restarts at every posting, so any
    * concatenation of these blobs decodes with [[decodePositionsBlock]]. */
  def encodePositions(ps: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(ps.length + 4)
    writeVarLong(out, ps.length)
    var prev = 0L
    var i = 0
    while (i < ps.length) {
      writeVarLong(out, if (i == 0) ps(0) else ps(i) - prev)
      prev = ps(i)
      i += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------- block layout

  /** Encoded segment payload: blobs + block directory.
    * Per block i the directory keeps (maxTf, minLen): the block-max WAND
    * upper bound is quotient(maxTf_i, minLen_i, avgdl), computed at QUERY
    * time. The quotient is monotone increasing in tf and decreasing in
    * len, so the bound is admissible for ANY avgdl — which keeps old
    * segments valid when the corpus (and its avgdl) grows incrementally. */
  final case class Blocks(
      docBlob: Array[Byte],
      tfBlob: Array[Byte],
      blockLastDoc: Array[Long],
      blockMaxTf: Array[Long],
      blockMinLen: Array[Long],
      blockDocOff: Array[Int],
      blockTfOff: Array[Int],
      posBlob: Array[Byte],
      blockPosOff: Array[Int])

  /** Encode postings (parallel arrays, docIDs strictly increasing) into
    * the restart-point block layout. `lens(i)` is the token length of the
    * posting's document (for the per-block minLen bound). `posBlobs` is
    * either null (non-positional index) or, per posting, that posting's
    * positions PRE-ENCODED by [[encodePositions]] — blobs are
    * concatenated verbatim (each is delta-restarted, so the result is
    * the same bytes a direct encode would produce), with `blockPosOff`
    * marking each block's first posting. */
  def encodeBlocks(ids: Array[Long], tfs: Array[Long], lens: Array[Long],
                   posBlobs: Array[Array[Byte]] = null): Blocks = {
    val n = ids.length
    val nBlocks = (n + BlockSize - 1) / BlockSize
    val docOut = new ByteArrayOutputStream(n * 2)
    val tfOut = new ByteArrayOutputStream(n)
    val posOut = if (posBlobs == null) null else new ByteArrayOutputStream(n * 2)
    val lastDoc = new Array[Long](nBlocks)
    val maxTf = new Array[Long](nBlocks)
    val minLen = new Array[Long](nBlocks)
    val docOff = new Array[Int](nBlocks)
    val tfOff = new Array[Int](nBlocks)
    val posOff = new Array[Int](if (posBlobs == null) 0 else nBlocks)
    var b = 0
    while (b < nBlocks) {
      val start = b * BlockSize
      val end = math.min(start + BlockSize, n)
      docOff(b) = docOut.size()
      tfOff(b) = tfOut.size()
      if (posOut != null) posOff(b) = posOut.size()
      var prev = 0L
      var mtf = 0L
      var mlen = Long.MaxValue
      var i = start
      while (i < end) {
        writeVarLong(docOut, if (i == start) ids(i) else ids(i) - prev)
        prev = ids(i)
        writeVarLong(tfOut, tfs(i))
        if (tfs(i) > mtf) mtf = tfs(i)
        if (lens(i) < mlen) mlen = lens(i)
        if (posOut != null) posOut.write(posBlobs(i), 0, posBlobs(i).length)
        i += 1
      }
      lastDoc(b) = ids(end - 1)
      maxTf(b) = mtf
      minLen(b) = mlen
      b += 1
    }
    Blocks(docOut.toByteArray, tfOut.toByteArray, lastDoc, maxTf, minLen,
      docOff, tfOff,
      if (posOut == null) Array.emptyByteArray else posOut.toByteArray, posOff)
  }

  /** Decode the positions of every posting in one block (restart-point
    * independent). Returns `count` arrays of strictly increasing token
    * positions. */
  def decodePositionsBlock(posBlob: Array[Byte], posOff: Int,
                           count: Int): Array[Array[Long]] = {
    val out = new Array[Array[Long]](count)
    var p = posOff
    var i = 0
    while (i < count) {
      val (np, p1) = readVarLong(posBlob, p)
      p = p1
      val ps = new Array[Long](np.toInt)
      var prev = 0L
      var k = 0
      while (k < np) {
        val (v, p2) = readVarLong(posBlob, p)
        prev = if (k == 0) v else prev + v
        ps(k) = prev
        p = p2
        k += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Decode one block (restart-point independent). Returns parallel
    * (ids, tfs) arrays of length `count`. */
  def decodeBlock(docBlob: Array[Byte], tfBlob: Array[Byte],
                  docOff: Int, tfOff: Int, count: Int): (Array[Long], Array[Long]) = {
    val ids = new Array[Long](count)
    val tfs = new Array[Long](count)
    var p = docOff
    var prev = 0L
    var i = 0
    while (i < count) {
      val (v, np) = readVarLong(docBlob, p)
      prev = if (i == 0) v else prev + v
      ids(i) = prev; p = np; i += 1
    }
    var q = tfOff
    i = 0
    while (i < count) {
      val (v, nq) = readVarLong(tfBlob, q)
      tfs(i) = v; q = nq; i += 1
    }
    (ids, tfs)
  }

  /** Number of postings in block `b` of a segment holding `count` total. */
  def blockCount(count: Int, b: Int): Int = {
    val start = b * BlockSize
    math.min(BlockSize, count - start)
  }
}

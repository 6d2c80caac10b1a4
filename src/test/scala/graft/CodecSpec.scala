package graft

import graft.functions.Codec
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class CodecSpec extends AnyFunSuite {

  /** Deterministic property driver (no scalatestplus bridge offline):
    * samples `n` values from `gen` with a fixed seed chain. */
  private def forAllGen[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced > 0, "generator produced no values")
  }

  private val sortedIds: Gen[Array[Long]] =
    for {
      n <- Gen.oneOf(0, 1, 2, 127, 128, 129, 300, 1000)
      gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 1L << 33))
      start <- Gen.chooseNum(0L, 1L << 40)
    } yield gaps.scanLeft(start)(_ + _).tail.toArray

  test("varint round-trip for single values incl. boundaries") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)) {
      val out = new java.io.ByteArrayOutputStream()
      Codec.writeVarLong(out, v)
      val (r, pos) = Codec.readVarLong(out.toByteArray, 0)
      assert(r == v && pos == out.size())
    }
  }

  test("delta+varint: decode(encode(xs)) == xs (property)") {
    forAllGen(sortedIds) { ids =>
      assert(Codec.decodeDeltas(Codec.encodeDeltas(ids), ids.length).sameElements(ids))
    }
  }

  test("int list round-trip (property)") {
    forAllGen(Gen.listOf(Gen.chooseNum(0L, 1L << 40))) { vs =>
      val a = vs.toArray
      assert(Codec.decodeInts(Codec.encodeInts(a), a.length).sameElements(a))
    }
  }

  test("block layout: every block independently decodable; directory consistent") {
    forAllGen(sortedIds.suchThat(_.nonEmpty)) { ids =>
      val tfs = ids.map(i => (i % 7) + 1)
      val lens = ids.map(i => (i % 13) + 5)
      val b = Codec.encodeBlocks(ids, tfs, lens)
      val nBlocks = (ids.length + Codec.BlockSize - 1) / Codec.BlockSize
      assert(b.blockLastDoc.length == nBlocks)
      var off = 0
      for (blk <- 0 until nBlocks) {
        val cnt = Codec.blockCount(ids.length, blk)
        val (dIds, dTfs) = Codec.decodeBlock(
          b.docBlob, b.tfBlob, b.blockDocOff(blk), b.blockTfOff(blk), cnt)
        val start = blk * Codec.BlockSize
        assert(dIds.sameElements(ids.slice(start, start + cnt)))
        assert(dTfs.sameElements(tfs.slice(start, start + cnt)))
        assert(b.blockLastDoc(blk) == ids(start + cnt - 1))
        assert(b.blockMaxTf(blk) == tfs.slice(start, start + cnt).max)
        assert(b.blockMinLen(blk) == lens.slice(start, start + cnt).min)
        off += cnt
      }
      assert(off == ids.length)
    }
  }

  test("positions blob: per-block round-trip (property)") {
    forAllGen(sortedIds.suchThat(_.nonEmpty)) { ids =>
      val tfs = ids.map(i => (i % 5) + 1)
      val lens = ids.map(i => (i % 13) + 5)
      // strictly increasing positions per posting, length == tf
      val poss = ids.zip(tfs).map { case (id, tf) =>
        Array.iterate(id % 7, tf.toInt)(_ + 1 + (id % 3))
      }
      // production shape: per-posting pre-encode, concatenated verbatim
      val b = Codec.encodeBlocks(ids, tfs, lens, poss.map(Codec.encodePositions))
      val nBlocks = (ids.length + Codec.BlockSize - 1) / Codec.BlockSize
      for (blk <- 0 until nBlocks) {
        val cnt = Codec.blockCount(ids.length, blk)
        val got = Codec.decodePositionsBlock(b.posBlob, b.blockPosOff(blk), cnt)
        val start = blk * Codec.BlockSize
        for (i <- 0 until cnt)
          assert(got(i).sameElements(poss(start + i)))
      }
    }
  }

  test("compression is effective on dense lists") {
    val ids = Array.tabulate(10000)(i => 1000000L + i * 2)
    val enc = Codec.encodeDeltas(ids)
    assert(enc.length < ids.length * 2, s"dense gaps should take ~1 byte each, got ${enc.length}")
  }
}

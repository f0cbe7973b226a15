package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the incremental-curation shape:
  * documents arrive on a stream and candidate near-dup pairs surface
  * continuously, instead of recomputing a corpus-wide batch band join
  * per ingest cycle.
  *
  * The state story is what makes this scale: `flatMapGroupsWithState`
  * keys on the LSH band bucket, so each bucket retains only its own
  * 24-byte signatures (capped at `maxBucket`, the same occupancy bound
  * as the batch operator) — total state ≈ 4 signatures per doc ever
  * seen, spread over 4 x 65536 buckets, never the documents themselves.
  * A production deployment adds a state TTL (event-time timeout) to
  * age out buckets past the dedup horizon; the checkpoint-recovery spec
  * covers restart semantics for stateful queries generally.
  *
  * Results are bit-compatible with the batch operator: StreamingSpec
  * asserts the streamed pair set equals [[graft.operators.Dedup
  * .simhashPairs]] on the same corpus, arrival-order- and
  * micro-batch-boundary-independent. */
object DedupStream {
  case class DocSig(docId: Long, shLo: Long, shHi: Long)
  case class BandDoc(b: Int, bk: Long, docId: Long, shLo: Long, shHi: Long)
  case class BucketState(docs: List[DocSig])
  case class NearPair(docA: Long, docB: Long, hamming: Int)

  /** Per-doc 64-bit SimHash, bit-identical to the batch
    * [[graft.operators.Dedup.simhash]] aggregation (same md5 token
    * bits, same ±1 bit sums, same >0 packing) — computed as a pure map
    * here because a stream admits no corpus-wide shuffle before the
    * stateful stage, and SimHash is per-doc by definition (the batch
    * groupBy exists for codegen, not semantics). */
  def signature(text: String): (Long, Long) = {
    require(text != null,
      "null-text docs are dropped upstream (signatures), matching batch " +
        "explode(split(null)) semantics — they must not reach signature()")
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](64)
    text.split(" ", -1).foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      val lo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val hi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        sums(b) += (if (((lo >> b) & 1L) == 1L) 1 else -1)
        sums(32 + b) += (if (((hi >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    var shLo = 0L
    var shHi = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) shLo |= 1L << b
      if (sums(32 + b) > 0) shHi |= 1L << b
      b += 1
    }
    (shLo, shHi)
  }

  /** Stream map stage: (doc_id, text) → SimHash signatures. A null-text
    * doc emits NO DocSig — the batch twin's explode(split(null)) drops
    * the document entirely, and mapping null to "" here would instead
    * produce a real signature (the empty-token one), letting the doc
    * enter bucket state and emit pairs the batch operator never produces,
    * breaking the asserted stream==batch bit-compatibility. */
  def signatures(docs: Dataset[(Long, String)]): Dataset[DocSig] = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, t) =>
      if (t == null) Iterator.empty
      else {
        val (lo, hi) = signature(t)
        Iterator.single(DocSig(id, lo, hi))
      }
    }
  }

  /** The same 4 x 16-bit banding as the batch operator, as a stream-safe
    * flatMap. */
  def bandDocs(sig: Dataset[DocSig]): Dataset[BandDoc] = {
    import sig.sparkSession.implicits._
    sig.flatMap { s =>
      Seq(
        BandDoc(0, s.shLo & 65535L, s.docId, s.shLo, s.shHi),
        BandDoc(1, (s.shLo >> 16) & 65535L, s.docId, s.shLo, s.shHi),
        BandDoc(2, s.shHi & 65535L, s.docId, s.shLo, s.shHi),
        BandDoc(3, (s.shHi >> 16) & 65535L, s.docId, s.shLo, s.shHi))
    }
  }

  /** Per-bucket stateful candidate generation: every arriving doc is
    * compared against the bucket's retained signatures and pairs within
    * `maxHamming` emit immediately (append mode — a pair, once found,
    * is final). Pairs surfacing in multiple bands dedup downstream,
    * exactly like the batch operator's `distinct`. A re-delivered docId
    * (source replay after recovery) still emits its pairs — idempotent
    * under the downstream dedup — but is NOT re-added to state, so
    * replays neither inflate state nor burn the cap.
    *
    * `maxBucket` defaults to the batch operator's occupancy bound; note
    * the mechanisms differ past the cap: batch sub-splits a hot bucket
    * with a secondary key (keeps comparing, bounded recall loss), while
    * the stream stops RETAINING new signatures in that bucket — pairs
    * among docs that BOTH arrive after the cap go unseen in that band.
    * A documented trade: template-flooded buckets are precisely where
    * unbounded streaming state would otherwise grow without limit. */
  def nearDupPairs(banded: Dataset[BandDoc], maxHamming: Int = 3,
                   maxBucket: Int = 100000): Dataset[NearPair] = {
    import banded.sparkSession.implicits._
    banded.groupByKey(d => (d.b, d.bk))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), docs: Iterator[BandDoc], state: GroupState[BucketState]) => {
          var hist = state.getOption.map(_.docs).getOrElse(Nil)
          var n = hist.size // once per group call, not per doc
          val out = List.newBuilder[NearPair]
          docs.foreach { d =>
            var seen = false
            hist.foreach { s =>
              if (s.docId == d.docId) seen = true
              else {
                val h = java.lang.Long.bitCount(s.shLo ^ d.shLo) +
                  java.lang.Long.bitCount(s.shHi ^ d.shHi)
                if (h <= maxHamming)
                  out += (if (s.docId < d.docId) NearPair(s.docId, d.docId, h)
                          else NearPair(d.docId, s.docId, h))
              }
            }
            if (!seen && n < maxBucket) {
              hist = DocSig(d.docId, d.shLo, d.shHi) :: hist
              n += 1
            }
          }
          state.update(BucketState(hist))
          out.result().iterator
        })
  }
}

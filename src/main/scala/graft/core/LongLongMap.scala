package graft.core

/** Minimal open-addressing long→long hash table for broadcast models
  * (lmScore's bigram/unigram counts): primitive arrays, multiply-shift
  * probing, zero allocation per lookup — java.util.HashMap[jLong,jLong]
  * boxes the key on EVERY get, one garbage object per probe on the
  * serve hot path. Values are counts (≥ 1 by construction), so 0 is
  * the absent sentinel and `get` never allocates or branches on a
  * wrapper. Not thread-safe during build; safe for concurrent reads
  * after (broadcast use). */
final class LongLongMap(expectedSize: Int) extends Serializable {
  private val bits: Int = {
    var b = 4
    while ((1L << b) < expectedSize.toLong * 2) b += 1
    b
  }
  private val cap = 1 << bits
  private val mask = cap - 1
  private val keys = new Array[Long](cap)
  private val vals = new Array[Long](cap)
  // key 0 needs a side slot (0 marks an empty bucket)
  private var zeroVal = 0L
  private var n = 0

  private def idx0(k: Long): Int =
    ((k * 0x9E3779B97F4A7C15L) >>> (64 - bits)).toInt & mask

  /** Reject an insert that would fill the LAST empty bucket: get()'s
    * linear probe terminates on an empty slot or a match, so a 100%-full
    * table would spin forever on a lookup for an absent key. Keeping one
    * bucket free guarantees every probe sequence terminates. */
  private def checkRoom(): Unit =
    if (n + 1 >= cap)
      throw new IllegalStateException(
        s"LongLongMap over capacity: $n entries, sized for $expectedSize")

  /** Insert or overwrite. The table is fixed-capacity (2× expected):
    * inserting more than `cap - 1` distinct keys throws rather than loops. */
  def put(k: Long, v: Long): Unit = {
    if (k == 0L) { zeroVal = v; return }
    var i = idx0(k)
    while (true) {
      val k0 = keys(i)
      if (k0 == 0L) { checkRoom(); keys(i) = k; vals(i) = v; n += 1; return }
      if (k0 == k) { vals(i) = v; return }
      i = (i + 1) & mask
    }
  }

  /** Add `v` to the current value (0 if absent) — the fold-build form. */
  def addTo(k: Long, v: Long): Unit = {
    if (k == 0L) { zeroVal += v; return }
    var i = idx0(k)
    while (true) {
      val k0 = keys(i)
      if (k0 == 0L) { checkRoom(); keys(i) = k; vals(i) = v; n += 1; return }
      if (k0 == k) { vals(i) += v; return }
      i = (i + 1) & mask
    }
  }

  /** Count for `k`, or 0 when absent (counts are ≥ 1 by contract). */
  def get(k: Long): Long = {
    if (k == 0L) return zeroVal
    var i = idx0(k)
    while (true) {
      val k0 = keys(i)
      if (k0 == k) return vals(i)
      if (k0 == 0L) return 0L
      i = (i + 1) & mask
    }
    0L // unreachable
  }

  def size: Int = n + (if (zeroVal != 0L) 1 else 0)
}

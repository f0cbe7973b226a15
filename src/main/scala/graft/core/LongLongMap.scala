package graft.core

/** Minimal open-addressing long→long hash table for broadcast models
  * (lmScore's bigram/unigram counts): primitive arrays, multiply-shift
  * probing, zero allocation per lookup — java.util.HashMap[jLong,jLong]
  * boxes the key on EVERY get, one garbage object per probe on the
  * serve hot path. Values are counts (≥ 1 by construction), so 0 is
  * the absent sentinel and `get` never allocates or branches on a
  * wrapper. Not thread-safe during build; safe for concurrent reads
  * after (broadcast use).
  *
  * Default contract is FIXED capacity (2× expected, insert past it
  * throws) — the bounded-model guarantee lmScore's pruned path relies
  * on. `growable = true` opts into doubling rehash instead, for builds
  * whose final size is unknown up front (the streaming partial merge,
  * where the exact path's table is bounded by the minCount=1 contract
  * itself, not by the initial sizing). */
final class LongLongMap(expectedSize: Int, growable: Boolean = false)
    extends Serializable {
  private var bits: Int = {
    var b = 4
    while ((1L << b) < expectedSize.toLong * 2) b += 1
    b
  }
  private var cap = 1 << bits
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  // key 0 needs a side slot (0 marks an empty bucket)
  private var zeroVal = 0L
  private var n = 0

  private def idx0(k: Long): Int =
    ((k * 0x9E3779B97F4A7C15L) >>> (64 - bits)).toInt & mask

  /** Reject an insert that would fill the LAST empty bucket: get()'s
    * linear probe terminates on an empty slot or a match, so a 100%-full
    * table would spin forever on a lookup for an absent key. Keeping one
    * bucket free guarantees every probe sequence terminates. Growable
    * tables rehash at 3/4 load instead of rejecting. */
  private def checkRoom(): Unit =
    if (growable) {
      if (n + 1 >= (cap >> 2) * 3) grow()
    } else if (n + 1 >= cap)
      throw new IllegalStateException(
        s"LongLongMap over capacity: $n entries, sized for $expectedSize")

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ocap = cap
    bits += 1
    cap = 1 << bits
    mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    var i = 0
    while (i < ocap) {
      val k = ok(i)
      if (k != 0L) { // occupancy is keyed on the key, not the value
        var j = idx0(k)
        while (keys(j) != 0L) j = (j + 1) & mask
        keys(j) = k
        vals(j) = ov(i)
      }
      i += 1
    }
  }

  /** Insert or overwrite. The table is fixed-capacity (2× expected):
    * inserting more than `cap - 1` distinct keys throws rather than
    * loops (growable tables rehash instead). */
  def put(k: Long, v: Long): Unit = {
    if (k == 0L) { zeroVal = v; return }
    var i = idx0(k)
    while (true) {
      val k0 = keys(i)
      if (k0 == 0L) {
        checkRoom()
        i = idx0(k) // a grow() moved every bucket — re-derive the slot
        while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
        if (keys(i) == k) { vals(i) = v; return }
        keys(i) = k; vals(i) = v; n += 1; return
      }
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
      if (k0 == 0L) {
        checkRoom()
        i = idx0(k) // a grow() moved every bucket — re-derive the slot
        while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
        if (keys(i) == k) { vals(i) += v; return }
        keys(i) = k; vals(i) = v; n += 1; return
      }
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

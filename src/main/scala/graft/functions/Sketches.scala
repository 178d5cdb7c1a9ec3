package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Statistics sketches — the Spark-native analog of the reference's
  * `statistics` package, whose ANALYZE pipeline builds a Count-Min sketch
  * per column/index for point-frequency estimation
  * (`statistics/cmsketch.go:27-34`: depth×width uint32 table, point query
  * = min over rows; default depth 5 × width 2048 at
  * `executor/analyze.go:60-61`) and an FM sketch for NDV estimation
  * (`statistics/fmsketch.go:27-47`: adaptive-mask distinct sampling,
  * NDV = (mask+1)·|hashset|).
  *
  * Both are implemented as typed [[Aggregator]]s — the partial-state
  * create/update/merge shape SURVEY §2.9 maps the reference's AggFunc
  * framework onto. That makes them mergeable sketches in the Spark
  * execution model: each task folds its partition into a bounded-size
  * buffer (80 KB for CM 5×2048, ≤8·maxSize bytes for FM), partial
  * buffers map-side combine, and one reduce merges — the same
  * partial→final dataflow as the reference's ANALYZE coprocessor pass,
  * and the posture that holds at 100 TB (state is sketch-sized, never
  * data-sized; one shuffle of sketch bytes per table).
  */
object Sketches {

  /** Seeded 64-bit hash over UTF-8 bytes: FNV-1a style accumulation with
    * a splitmix64 finalizer for avalanche (public-domain constants). The
    * reference hashes encoded datum bytes with a 128-bit murmur
    * (`cmsketch.go:64-66`); any well-mixed hash family preserves the
    * sketch guarantees, so we derive the d row-hashes from two seeded
    * 64-bit hashes (h1 + i·h2 — standard double hashing).
    */
  def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  // ------------------------------------------------------------- Count-Min

  /** Sketch layout (finish output and buffer alike):
    * [depth, width, rowCount, counters(row-major depth×width)].
    */
  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {

    override def zero: Array[Long] = {
      val b = new Array[Long](3 + depth * width)
      b(0) = depth; b(1) = width
      b
    }

    override def reduce(b: Array[Long], key: String): Array[Long] = {
      if (key != null) {
        val (h1, h2) = cmHashes(key.getBytes("UTF-8"))
        b(2) += 1
        var i = 0
        while (i < depth) {
          b(3 + i * width + cmIndex(h1, h2, i, width)) += 1
          i += 1
        }
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // dimensions are construction-time constants, so they always agree
      // (the reference's MergeCMSketch errors on mismatch, cmsketch.go:79)
      var i = 2
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** The ONE row-index contract the CM build (reduce) and the point
    * query ([[cmEstimate]]) must share byte-for-byte: two seeded
    * 64-bit hashes combined h1 + i*h2 (standard double hashing),
    * floorMod'd into the row. Previously duplicated at both sites —
    * a seed or formula edit in one place would silently degrade every
    * estimate to a min over unrelated counters.
    */
  private def cmHashes(bytes: Array[Byte]): (Long, Long) =
    (hash64(bytes, 0x9e3779b97f4a7c15L), hash64(bytes, 0xc2b2ae3d27d4eb4fL))
  private def cmIndex(h1: Long, h2: Long, i: Int, width: Int): Int =
    java.lang.Math.floorMod(h1 + i.toLong * h2, width.toLong).toInt

  /** Point-frequency estimate from a collected sketch: min over the d
    * counters the key hashes to (`cmsketch.go:63-66` QueryBytes). Always
    * ≥ the true count; overshoot is bounded by colliding mass / width.
    */
  def cmEstimate(sketch: Array[Long], key: String): Long = {
    val depth = sketch(0).toInt
    val width = sketch(1).toInt
    val (h1, h2) = cmHashes(key.getBytes("UTF-8"))
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      est = math.min(est, sketch(3 + i * width + cmIndex(h1, h2, i, width)))
      i += 1
    }
    est
  }

  /** Total rows folded into a sketch (`cmsketch.go:148` TotalCount). */
  def cmTotal(sketch: Array[Long]): Long = sketch(2)

  // ------------------------------------------------------------- FM sketch

  /** FM buffer: the survivor hash set plus the current mask. Kryo-encoded
    * (only crosses the wire at partial→final, sketch-sized).
    */
  final class FMBuf(var mask: Long,
      val set: java.util.HashSet[java.lang.Long]) extends Serializable

  /** NDV sketch (`fmsketch.go:27-62`): keep only hashes whose low bits
    * under `mask` are zero; when more than `maxSize` survive, double the
    * mask and prune, so the surviving set is a uniform 1/(mask+1) sample
    * of the distinct hashes and NDV ≈ (mask+1)·|set|. While the true NDV
    * stays ≤ maxSize the mask never grows and the estimate is EXACT
    * (modulo 64-bit hash collisions) — that regime is what the oracled
    * query runs in; the adaptive regime is spec-tested for tolerance.
    *
    * Delta from the reference: growth loops until the survivor set fits
    * (the reference's single post-insert check, `fmsketch.go:54-61`, can
    * leave a transiently oversized set whose final state depends on
    * arrival order). Looping makes the final state a pure function of the
    * input SET — order- and partitioning-independent, which the merge
    * spec pins.
    */
  final class FMSketchAgg(maxSize: Int)
      extends Aggregator[String, FMBuf, Long] {

    override def zero: FMBuf = new FMBuf(0L, new java.util.HashSet[java.lang.Long]())

    private def insertHash(b: FMBuf, h: Long): Unit = {
      if ((h & b.mask) == 0L) {
        b.set.add(h)
        while (b.set.size > maxSize) {
          b.mask = b.mask * 2 + 1
          val it = b.set.iterator()
          while (it.hasNext) {
            if ((it.next().longValue() & b.mask) != 0L) it.remove()
          }
        }
      }
    }

    override def reduce(b: FMBuf, key: String): FMBuf = {
      if (key != null) insertHash(b, hash64(key.getBytes("UTF-8"), 0x27d4eb2f165667c5L))
      b
    }

    override def merge(a: FMBuf, b: FMBuf): FMBuf = {
      if (a.mask < b.mask) {
        a.mask = b.mask
        val it = a.set.iterator()
        while (it.hasNext) {
          if ((it.next().longValue() & a.mask) != 0L) it.remove()
        }
      }
      val it = b.set.iterator()
      while (it.hasNext) insertHash(a, it.next().longValue())
      a
    }

    override def finish(b: FMBuf): Long = (b.mask + 1) * b.set.size.toLong
    override def bufferEncoder: Encoder[FMBuf] = Encoders.kryo[FMBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  // ----------------------------------------------------------- Misra-Gries

  /** MG buffer: key → counter, at most k entries (kryo-encoded; only
    * crosses the wire at partial→final, k-bounded).
    */
  final class MGBuf(val counts: java.util.HashMap[String, Long])
      extends Serializable

  /** Misra-Gries heavy hitters with k counters: every key with true
    * frequency > n/(k+1) is guaranteed present, and each reported count
    * underestimates the truth by at most n/(k+1) (one-sided — the dual
    * of Count-Min's overestimate). The merge subtracts the (k+1)-th
    * largest combined counter from everything and keeps the positive
    * remainder, which preserves the bound under partial→final
    * aggregation (the mergeable-summaries construction), so the sketch
    * rides Spark's map-side combine like the CM/FM aggregators.
    *
    * While the stream's true NDV stays ≤ k no counter is ever
    * decremented and every count is EXACT — the regime the oracled
    * query runs in; the adaptive regime's bound is pinned by SketchSpec.
    */
  final class MisraGriesAgg(k: Int)
      extends Aggregator[String, MGBuf, Map[String, Long]] {

    override def zero: MGBuf = new MGBuf(new java.util.HashMap[String, Long]())

    override def reduce(b: MGBuf, key: String): MGBuf = {
      if (key != null) {
        val cur = b.counts.get(key)
        if (cur != 0L || b.counts.containsKey(key))
          b.counts.put(key, cur + 1)
        else if (b.counts.size < k) b.counts.put(key, 1L)
        else {
          // decrement-all: the classic MG step (charge this arrival and
          // one unit of k existing counters against the error budget)
          val it = b.counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
          }
        }
      }
      b
    }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val it = b.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        a.counts.merge(e.getKey, e.getValue, (x, y) => x + y)
      }
      if (a.counts.size > k) {
        // subtract the (k+1)-th largest counter, keep the positive part
        val vals = new java.util.ArrayList[Long](a.counts.values())
        vals.sort(java.util.Collections.reverseOrder[Long]())
        val cut = vals.get(k)
        val jt = a.counts.entrySet().iterator()
        while (jt.hasNext) {
          val e = jt.next()
          if (e.getValue <= cut) jt.remove() else e.setValue(e.getValue - cut)
        }
      }
      a
    }

    override def finish(b: MGBuf): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      b.counts.asScala.toMap
    }
    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}

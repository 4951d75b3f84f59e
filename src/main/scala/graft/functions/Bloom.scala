package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as PURE built-in Column combinators — no UDF, no custom
  * expression, no driver-side bit twiddling. The filter is a one-row
  * DataFrame holding an `array<bigint>` of bit words, built by the same
  * declarative machinery that will probe it, so build and probe agree by
  * construction (same `xxhash64(h, j) mod m` position math spelled once
  * in [[bitPositions]]).
  *
  * Probe sites consume the one-row frame via `crossJoin(broadcast(bits))`
  * — the proven repo shape for per-row access to a broadcast bitset (the
  * q67 containment compare rides the same broadcast-NLJ pattern): the
  * joined row exposes the words array by reference, `element_at` +
  * `shiftright`/`&` test k bits per probe in generated code, and nothing
  * array-sized is copied per row.
  *
  * Sizing: `bitsPerKey` ≈ 16 with `k` = 6 gives ~0.04% false positives —
  * and callers that need EXACT results verify candidates afterwards (see
  * text/BloomDecontaminate.scala), so FP rate is a cost knob, not a
  * correctness one.
  */
object Bloom {

  /** Default hash probes per key. */
  val DefaultK = 6

  /** Bit positions of `h` (a 64-bit hash column) in a filter of `m` bits:
    * `pmod(xxhash64(h, j), m)` for j in 0 until k. xxhash64 is a Spark
    * built-in (codegen'd); feeding (h, j) gives k independent streams.
    */
  def bitPositions(h: Column, m: Long, k: Int): Seq[Column] =
    (0 until k).map(j => pmod(xxhash64(h, lit(j)), lit(m)))

  /** Word count of an `m`-bit filter (m rounded up to a 64 multiple). */
  def numWords(m: Long): Int = (((m + 63) / 64)).toInt

  /** Build the filter over a column of 64-bit hashes: ONE row with
    * `bits: array<bigint>` of [[numWords]] words. Distributed end-to-end —
    * per-word `bit_or` partial-aggregates map-side, the final global agg
    * assembles the dense array in-plan. Empty input yields an all-zero
    * filter (probes return false).
    *
    * The final assembly task collects numWords (word, bits) structs — the
    * filter's own size class, which must broadcast anyway, so the task is
    * bounded by design (a 100M-key/16-bit filter is ~25M words ≈ a few
    * hundred MB transient in that one task; beyond that, the broadcast
    * itself is the binding constraint, not this assembly).
    */
  def bits(hashes: DataFrame, hCol: String, m: Long, k: Int = DefaultK): DataFrame = {
    require(m > 0 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    // numWords truncates to Int: past this bound the filter would silently
    // build EMPTY and every probe would return false — bloom false
    // negatives, the one failure mode the design forbids. Fail named (a
    // filter this size cannot broadcast anyway).
    require(m <= 64L * Int.MaxValue,
      s"filter of $m bits exceeds the ${64L * Int.MaxValue}-bit array bound")
    val nw = numWords(m)
    val pos = hashes.select(
      explode(array(bitPositions(col(hCol), m, k): _*)).as("p"))
    val words = pos.select((col("p") / 64).cast("int").as("w"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("b"))
      .groupBy(col("w")).agg(expr("bit_or(b)").as("bw"))
    // Dense assembly via a range LEFT JOIN + one ordered collect — O(nw log
    // nw) in the final task. NOT map_from_entries + per-index element_at:
    // Spark's map element_at is a LINEAR scan of ArrayBasedMapData, which
    // turns the assembly O(nw²) in one task — measured 65s at a 117k-word
    // filter (and quadratic in the eval corpus from there).
    hashes.sparkSession.range(nw).toDF("w")
      .select(col("w").cast("int").as("w"))
      .join(words, Seq("w"), "left")
      .groupBy()
      .agg(transform(
        array_sort(collect_list(struct(col("w"), coalesce(col("bw"), lit(0L)).as("bw")))),
        e => e.getField("bw")).as("bits"))
  }

  /** Membership probe: true iff every one of the k bits of `h` is set in
    * `bitsCol` (the words array from [[bits]], reached through the
    * crossJoin-broadcast row). No false negatives; false positives at the
    * sized rate.
    */
  def mightContain(h: Column, bitsCol: Column, m: Long, k: Int = DefaultK): Column =
    bitPositions(h, m, k).map { p =>
      val word = element_at(bitsCol, (p / 64).cast("int") + 1)
      call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}

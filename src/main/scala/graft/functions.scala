package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ExprBridge

/** Column-level entry points for graft's native Catalyst expressions. */
object functions {
  /** BPE-ish token estimate per string (see [[expressions.TokenCount]]). */
  def token_count(c: Column): Column =
    ExprBridge.column(expressions.TokenCount(ExprBridge.expression(c)))

  /** High-fidelity cl100k_base token estimate: exact published
    * pre-tokenizer segmentation, approximate within-piece splits (see
    * [[expressions.TokenCountCl100k]] for the surface split vs
    * [[token_count]]).
    */
  def token_count_cl100k(c: Column): Column =
    ExprBridge.column(expressions.TokenCountCl100k(ExprBridge.expression(c)))

  /** Codegen'd float-vector dot product (see [[expressions.VecDot]]);
    * bit-equal to the aggregate/zip_with fold it replaces.
    */
  def vec_dot(a: Column, b: Column): Column =
    ExprBridge.column(expressions.VecDot(
      ExprBridge.expression(a), ExprBridge.expression(b)))

  /** Codegen'd squared L2 distance between a float vector and a double
    * centroid (see [[expressions.VecDistSq]]); bit-equal to the
    * aggregate/zip_with fold it replaces.
    */
  def vec_dist_sq(v: Column, c: Column): Column =
    ExprBridge.column(expressions.VecDistSq(
      ExprBridge.expression(v), ExprBridge.expression(c)))

  /** Unicode NFC canonical normalization (see
    * [[expressions.NfcNormalize]]); value-equal to DuckDB's
    * nfc_normalize.
    */
  def nfc_normalize(c: Column): Column =
    ExprBridge.column(expressions.NfcNormalize(ExprBridge.expression(c)))

  /** Winnowing fingerprint set of a string (see
    * [[expressions.WinnowFps]]); value-equal to the array-HOF
    * formulation it replaces.
    */
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    ExprBridge.column(expressions.WinnowFps(ExprBridge.expression(c), k, w))

  /** Deterministic sha256-derived uniform in [0, 1) (see
    * [[expressions.HashFraction]]); value-equal to the 8-term hex
    * decode it replaces and to the DuckDB oracle mirror.
    */
  def hash_fraction(c: Column): Column =
    ExprBridge.column(expressions.HashFraction(ExprBridge.expression(c)))

  /** MinHash signature array of a shingle array: element k is the
    * minimum of sha256_hex("k:" || shingle) over the array (see
    * [[expressions.MinhashSigs]]); bit-equal to the per-k
    * min(sha2(concat_ws...)) formulation it replaces and to the DuckDB
    * oracle CTE. Input must be non-empty (filter upstream).
    */
  def minhash_sigs(c: Column, funcs: Int): Column =
    ExprBridge.column(expressions.MinhashSigs(ExprBridge.expression(c), funcs))

  /** Perceptual average-hash of a binary blob packed into one BIGINT
    * (see [[expressions.MediaPhash]]); value-equal to the hex-parse HOF
    * it replaces and to the DuckDB oracle mirror. Input must be at
    * least `cells` bytes (filter upstream — q209's shape).
    */
  def media_phash(c: Column, cells: Int): Column =
    ExprBridge.column(expressions.MediaPhash(ExprBridge.expression(c), cells))

  /** One-pass waveform statistics over s16le PCM bytes as array<bigint>
    * [n_samples, peak, sum_sq, n_clipped, zero_cross] (see
    * [[expressions.AudioStats]]); integer-exact, value-equal to the
    * DuckDB oracle mirror. Input must be at least 2 bytes (filter
    * upstream — q213's shape).
    */
  def audio_stats(c: Column): Column =
    ExprBridge.column(expressions.AudioStats(ExprBridge.expression(c)))

  /** Perceptual energy-envelope hash of s16le PCM packed into one
    * BIGINT (see [[expressions.AudioPhash]]); gain-invariant, integer-
    * exact, value-equal to the DuckDB oracle mirror. Input must be at
    * least `2 * cells` bytes (filter upstream — q215's shape).
    */
  def audio_phash(c: Column, cells: Int): Column =
    ExprBridge.column(expressions.AudioPhash(ExprBridge.expression(c), cells))

  /** Box-filter downsample of s16le PCM to `frames` signed integer
    * window means (see [[expressions.AudioResample]]); truncating
    * division on both sides, value-equal to the DuckDB oracle mirror.
    * Input must be at least `2 * frames` bytes (filter upstream —
    * q216's shape).
    */
  def audio_resample(c: Column, frames: Int): Column =
    ExprBridge.column(expressions.AudioResample(ExprBridge.expression(c), frames))

  /** Box-filter resample of a luma byte signal to `cells` integer
    * means (see [[expressions.LumaResize]]); value-equal to the DuckDB
    * oracle mirror. Input must be at least `cells` bytes (filter
    * upstream — q214's shape).
    */
  def luma_resize(c: Column, cells: Int): Column =
    ExprBridge.column(expressions.LumaResize(ExprBridge.expression(c), cells))

  /** Covered-character counts of one document's repetition statistics
    * as struct<top2_chars, top3_chars, dup5_chars : bigint> (see
    * [[expressions.RepCoverage]]); value-equal to the Scala kernel it
    * replaces (`TextAnalytics.repCoverageOf`, kept as the spec
    * cross-check) and to the DuckDB oracle's declarative
    * explode+window form — q198's shape.
    */
  def rep_coverage(c: Column): Column =
    ExprBridge.column(expressions.RepCoverage(ExprBridge.expression(c)))
}

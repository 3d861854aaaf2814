package graft.expressions

import java.nio.charset.StandardCharsets
import java.util.{HashMap => JHashMap}

/** Exact byte-pair-encoding over a tiktoken-format ranks table — the
  * second stage the reference's counter runs
  * (`/root/reference/internal/cli/estimation.go:13-21` via
  * tiktoken-go): after the pre-tokenizer splits text into pieces, each
  * piece's UTF-8 bytes are repeatedly pair-merged, always taking the
  * adjacent pair with the LOWEST rank in the learned table, until no
  * adjacent pair is mergeable; the piece's token count is the number
  * of surviving parts.
  *
  * The algorithm here is the published tiktoken `byte_pair_merge`
  * (educational reimplementation from the paper-level description —
  * greedy lowest-rank adjacent merge to fixpoint). The cl100k_base
  * DATA (~100k base64 lines, MIT-licensed with the tokenizer) is not
  * shippable from this zero-egress build environment, so the table is
  * pluggable: drop the published `cl100k_base.tiktoken` file on the
  * classpath or point `GRAFT_CL100K_RANKS` / `-Dgraft.cl100k.ranks`
  * at it and [[TokenCountCl100k]] becomes bit-exact; absent the file
  * it falls back to its range-faithful per-piece estimate. On a
  * cluster, ship the file with `--files` (executors resolve the same
  * env/property) — it is ~1.7 MB, loaded once per JVM.
  *
  * Ranks are keyed by the byte string's ISO-8859-1 decoding — a
  * bijective byte-to-char mapping, so `String` equality IS byte-array
  * equality and the JVM's cached string hash makes the inner-loop
  * lookups cheap.
  */
object BpeRanks {

  /** Parse tiktoken format: one `<base64-token> <rank>` pair per line,
    * blank lines ignored.
    */
  def parse(lines: Iterator[String]): JHashMap[String, Integer] = {
    val m = new JHashMap[String, Integer]()
    val b64 = java.util.Base64.getDecoder
    lines.foreach { line =>
      val t = line.trim
      if (t.nonEmpty) {
        val sp = t.indexOf(' ')
        require(sp > 0, s"malformed ranks line: '$t'")
        val bytes = b64.decode(t.substring(0, sp))
        m.put(new String(bytes, StandardCharsets.ISO_8859_1),
          Integer.valueOf(t.substring(sp + 1).toInt))
      }
    }
    m
  }

  def loadFile(path: String): JHashMap[String, Integer] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Human-readable description of where [[loadDefault]] resolved its
    * table from — the mode log line's provenance field.
    */
  def resolvedSource(): String =
    sys.env.get("GRAFT_CL100K_RANKS").map(p => s"env GRAFT_CL100K_RANKS=$p")
      .orElse(sys.props.get("graft.cl100k.ranks")
        .map(p => s"-Dgraft.cl100k.ranks=$p"))
      .getOrElse("classpath:/cl100k_base.tiktoken")

  /** Resolve the default table: explicit path (env, then system
    * property), then a classpath resource. None → estimator fallback.
    * An explicit path that cannot be read THROWS (with the configured
    * source named) rather than falling back — a typo'd path silently
    * downgrading exact counts to estimates is the failure mode ADVICE
    * r8 called out.
    */
  def loadDefault(): Option[JHashMap[String, Integer]] = {
    val explicit = sys.env.get("GRAFT_CL100K_RANKS")
      .orElse(sys.props.get("graft.cl100k.ranks"))
    explicit match {
      case Some(p) =>
        try Some(loadFile(p))
        catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalArgumentException(
              s"cl100k ranks table configured (${resolvedSource()}) but " +
                s"unreadable: $e", e)
        }
      case None =>
        Option(getClass.getResourceAsStream("/cl100k_base.tiktoken")).map { in =>
          val src = scala.io.Source.fromInputStream(in, "UTF-8")
          try parse(src.getLines()) finally src.close()
        }
    }
  }

  /** Token count of one pre-tokenizer piece under `ranks`: greedy
    * lowest-rank adjacent pair merge to fixpoint, count = surviving
    * parts. Bytes absent from the table survive as unmerged parts (the
    * real cl100k table contains all 256 single bytes, so this only
    * matters for synthetic test tables). Pieces are pre-tokenizer
    * outputs — short (words, digit runs, punctuation) — so the simple
    * O(n^2) scan per merge is flat-out faster than a heap for every
    * realistic piece length.
    */
  def countPiece(piece: String, ranks: JHashMap[String, Integer]): Int = {
    val bytes = piece.getBytes(StandardCharsets.UTF_8)
    if (bytes.length <= 1) return bytes.length
    val whole = new String(bytes, StandardCharsets.ISO_8859_1)
    if (ranks.containsKey(whole)) return 1
    // part boundaries: starts(i) .. starts(i+1) is part i
    val starts = scala.collection.mutable.ArrayBuffer.tabulate(bytes.length + 1)(identity)
    while (starts.length > 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < starts.length - 2) {
        val cand = whole.substring(starts(i), starts(i + 2))
        val r = ranks.get(cand)
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestIdx = i
        }
        i += 1
      }
      if (bestIdx < 0) return starts.length - 1
      starts.remove(bestIdx + 1) // merge parts bestIdx and bestIdx+1
    }
    starts.length - 1
  }
}

package graft.operators

/** DuckDB-SQL text builders that replay Spark's Murmur3_x86_32 string
  * hash (`org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes`
  * over UTF-8 bytes — the kernel behind `functions.hash()` and this
  * repo's MinHash/SimHash sketches) inside a single DuckDB statement.
  *
  * DuckDB exposes no murmur3, but the algorithm is ~15 lines of 32-bit
  * integer mixing — expressible as plain SQL over the token's UTF-8
  * bytes (recovered via `hex(encode(tok))` nibble lookups) with
  * `list_reduce` carrying the rolling h1 through the 4-byte chunks and
  * the byte tail. All arithmetic runs unsigned-32 in BIGINT, bouncing
  * through HUGEINT across the two multiplies that can exceed 2^63.
  * This is the same make-the-provenance-replayable move that converted
  * the IVF pair to exact oracles in round 17: once the hash replays,
  * MinHash banding, SimHash signatures and their downstream
  * dedup/decontamination joins become exact hash-checkable oracles
  * instead of rows-only checks.
  *
  * CAUTION (learned the hard way): DuckDB's binary operators `<< >> |
  * &` associate strictly left-to-right at equal precedence (`3 << 4 |
  * 3 >> 2` is `((3<<4)|3)>>2` = 12, not 48|0), so every builder below
  * parenthesizes exhaustively.
  *
  * Fidelity notes vs the JVM kernel:
  *  - 4-byte chunks are read little-endian, matching Platform.getInt
  *    on x86 (the only byte order Spark ships for parquet-compatible
  *    hosts);
  *  - tail bytes are SIGN-EXTENDED (Platform.getByte returns a signed
  *    byte) — `b + 4294967040` is `(b - 256) mod 2^32` for b >= 128;
  *  - the final value is folded back to signed int32, exactly what
  *    Spark's IntegerType hash() returns.
  *
  * Verified bit-exact against the JVM kernel over random ASCII and
  * multi-byte UTF-8 strings for both seeds in use (42, 1042) — see
  * Murmur3SqlSpec.
  */
object Murmur3Sql {

  private def mul32(x: String, c: Long): String =
    s"(((($x)::HUGEINT * $c) & 4294967295)::BIGINT)"
  private def rotl(x: String, r: Int): String =
    s"(((($x) << $r) | (($x) >> ${32 - r})) & 4294967295)"
  private def mixK1(k: String): String =
    mul32(rotl(mul32(k, 3432918353L), 15), 461845907L)
  private def mixH1(h: String, k: String): String = {
    val rot = rotl(s"xor(($h), ${mixK1(k)})", 13)
    s"((((($rot)::HUGEINT * 5) + 3864292196) & 4294967295)::BIGINT)"
  }
  private def fmix(h: String, n: String): String = {
    val s1 = s"xor(xor(($h), ($n)), (xor(($h), ($n))) >> 16)"
    val s2 = mul32(s1, 2246822507L)
    val s3 = s"xor($s2, ($s2) >> 13)"
    val s4 = mul32(s3, 3266489909L)
    s"xor($s4, ($s4) >> 16)"
  }

  private val foldLambda = s"(h, k) -> ${mixH1("h", "k")}"
  private val chunksExpr =
    "list_transform(range(len(bs) // 4), c -> " +
      "bs[(4*c)+1] + (256*bs[(4*c)+2]) + (65536*bs[(4*c)+3]) + (16777216*bs[(4*c)+4]))"
  private val tailExpr =
    "list_transform(range(len(bs) - (len(bs) % 4), len(bs)), " +
      "i -> CASE WHEN bs[i+1] >= 128 THEN bs[i+1] + 4294967040 ELSE bs[i+1] END)"

  /** CTE chain `{pfx}_tb, {pfx}_h1, {pfx}_h2, {pfx}_hash` mapping a
    * one-column CTE `toksCte(tok)` to `{pfx}_hash(tok, h32)` where
    * h32 = Spark `hash(tok)` with the given seed (signed int32 carried
    * in a BIGINT). Meant to be spliced into a WITH list.
    */
  def hashCtes(seed: Int, toksCte: String, pfx: String): String = s"""
    ${pfx}_tb AS (
      SELECT tok, list_transform(range(octet_length(encode(tok))),
               i -> (strpos('123456789abcdef', substr(lower(hex(encode(tok))), (2*i)+1, 1)) * 16)
                  + strpos('123456789abcdef', substr(lower(hex(encode(tok))), (2*i)+2, 1))) AS bs
      FROM $toksCte),
    ${pfx}_h1 AS (
      SELECT tok, len(bs) AS n,
             list_reduce(list_prepend(
                 list_reduce(list_prepend($seed::BIGINT, $chunksExpr), $foldLambda),
                 $tailExpr), $foldLambda) AS hpre
      FROM ${pfx}_tb),
    ${pfx}_h2 AS (SELECT tok, ${fmix("hpre", "n")} AS hu FROM ${pfx}_h1),
    ${pfx}_hash AS (
      SELECT tok, CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END AS h32
      FROM ${pfx}_h2)"""

  /** The collision escape hatch, as runnable SQL rather than prose:
    * Spark's `hash(array<long>, int)` — the band-bucket key the
    * MinHash oracles would switch to if a cross-tuple band-hash
    * collision ever tripped the hot-bucket census (see
    * [[minhashBandCtes]]) — is a chain of Murmur3_x86_32.hashLong
    * calls (one per element, each seeding the next) closed by one
    * hashInt over the band index. hashLong mixes the value's two
    * unsigned-32 halves through the same mixK1/mixH1 stages the
    * string kernel uses, then fmixes with n=8; hashInt is one mix +
    * fmix with n=4. Seeds stay in unsigned-32 (bit-identical to the
    * JVM's signed ints under the 2^32 masks); fold to signed once at
    * the end with [[signed32]]. IMPORTANT: chain via one CTE (or one
    * projected column) per stage, passing a COLUMN REFERENCE as
    * `seedU` — the mix builders duplicate their seed text many times
    * (rotl/fmix reuse their argument), so textually nesting one
    * builder's output into the next blows up exponentially. Pinned to
    * the JVM kernel and to Catalyst's hash() by Murmur3SqlSpec; the
    * staged SQL text itself verified bit-exact against DuckDB
    * (minhash-slot and boundary-long tuples, incl. negative longs'
    * arithmetic >> and two's-complement &) 2026-08-16.
    */
  def hashLongSql(x: String, seedU: String): String = {
    val low = s"(($x) & 4294967295)"
    val high = s"(((($x) >> 32)) & 4294967295)"
    fmix(mixH1(mixH1(seedU, low), high), "8")
  }

  /** Unsigned-32 replay of Murmur3_x86_32.hashInt — see [[hashLongSql]]. */
  def hashIntSql(x: String, seedU: String): String =
    fmix(mixH1(seedU, s"(($x) & 4294967295)"), "4")

  /** Fold an unsigned-32 BIGINT back to Spark's signed int32. */
  def signed32(h: String): String =
    s"(CASE WHEN ($h) >= 2147483648 THEN ($h) - 4294967296 ELSE ($h) END)"

  /** The 64 MinHash permutation coefficients as a VALUES list —
    * generated from [[graft.functions.MinHashSignature]]'s own arrays
    * so the oracle can never drift from the registered sketch.
    */
  def minhashPermsValues: String = {
    val as = graft.functions.MinHashSignature.As
    val bs = graft.functions.MinHashSignature.Bs
    (0 until graft.functions.MinHashSignature.NumHashes)
      .map(i => s"(${i}, ${as(i)}, ${bs(i)})")
      .mkString(",\n      ")
  }

  /** The one shared definition of the 3-word-shingle provenance every
    * shingle-consuming oracle replays (the DuckDB mirror of
    * [[graft.functions.WordShingles]]): distinct 3-grams of the
    * whitespace-split text, per document. Factored here so a future
    * change to shingling (width, tokenizer) cannot drift between the
    * five oracles that splice it — exact Jaccard, prefix filter,
    * MinHash banding, fuzzy decontamination, shingle stats.
    */
  val shingleSelect: String = """SELECT doc_id,
             list_distinct([array_to_string(words[i:i+2], ' ')
                            for i in range(1, len(words) - 1)]) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)"""

  /** CTE chain from `shf(doc_id, shingles)` (non-empty distinct
    * shingle lists) to `bands(doc_id, band, bkey)`: the 64-slot
    * MinHash signature grouped into 16 bands of 4 rows. The band key
    * is the raw 4-slot value tuple — the Spark side keys buckets on
    * `hash(slice(sig,...), band)`, and equal tuples hash equal, so
    * banding on the tuples replays the same candidate set up to a
    * ~2^-32-per-tuple-pair cross-tuple hash collision. A collision
    * diverges in two directions: it can ADD a spurious Spark-side
    * candidate (absorbed — the exact-Jaccard/containment verification
    * filters it identically on both sides), and it can merge two
    * tuples' counts in Spark's hot-bucket census so a bucket crosses
    * MaxBucketSize that the oracle's raw-tuple census does not — in
    * which case Spark DROPS pairs the oracle keeps and the hash check
    * fails loudly. The second direction is not absorbed by
    * verification; it needs a colliding tuple pair in a bucket within
    * one tuple's population of the cap, which no fixture approaches.
    * If a far-future sf ever trips it, replay Spark's
    * hash(array<long>, int) here via [[hashLongSql]]/[[hashIntSql]]
    * (one CTE stage per slot — see their scaladoc) instead of tuple
    * keys; the chain is spec-pinned and DuckDB-verified.
    */
  def minhashBandCtes: String = {
    val p = graft.functions.MinHashSignature.P
    s"""
    toks AS (SELECT DISTINCT unnest(shingles) AS tok FROM shf),
    ${hashCtes(42, "toks", "mh")},
    hmod AS (SELECT tok, ((h32 % $p) + $p) % $p AS hm FROM mh_hash),
    perms(i, a, b) AS (VALUES $minhashPermsValues),
    doctok AS (SELECT doc_id, unnest(shingles) AS tok FROM shf),
    sigs AS (
      SELECT d.doc_id, p.i, min(((p.a * h.hm) + p.b) % $p) AS s
      FROM doctok d JOIN hmod h USING (tok) CROSS JOIN perms p
      GROUP BY 1, 2),
    bands AS (
      SELECT doc_id, i // 4 AS band, list(s ORDER BY i) AS bkey
      FROM sigs GROUP BY 1, 2)"""
  }
}

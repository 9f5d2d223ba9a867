package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Pins the algorithm the Murmur3Sql DuckDB text encodes to Spark's
  * Murmur3_x86_32.hashUnsafeBytes — the JVM kernel behind hash(),
  * MinHashSignature and SimHash64. The mirror below follows the SQL
  * step for step (hex-nibble byte recovery, little-endian 4-byte
  * chunk fold, sign-extended byte tail, staged fmix, signed-int32
  * fold-back) in unsigned-32 arithmetic carried in Long — so a
  * transcription mistake in any mask, rotation or sign extension
  * fails here without needing DuckDB in the JVM. The SQL text itself
  * is exercised by the driver's DuckDB oracle on
  * q_dedup_minhash_lsh / q_dedup_simhash / q_decontaminate_fuzzy.
  */
class Murmur3SqlSpec extends AnyFunSuite {

  private val M = 0xffffffffL
  private def rotl(x: Long, r: Int): Long = ((x << r) | (x >> (32 - r))) & M
  private def mixK1(k: Long): Long =
    (rotl((k * 3432918353L) & M, 15) * 461845907L) & M
  private def mixH1(h: Long, k: Long): Long =
    ((rotl(h ^ mixK1(k), 13) * 5L) + 3864292196L) & M
  private def fmix(h0: Long, n: Long): Long = {
    val s1 = { val x = h0 ^ n; x ^ (x >> 16) }
    val s2 = (s1 * 2246822507L) & M
    val s3 = s2 ^ (s2 >> 13)
    val s4 = (s3 * 3266489909L) & M
    s4 ^ (s4 >> 16)
  }

  /** The SQL's computation: bytes from hex nibbles, aligned chunks
    * little-endian, tail sign-extended, fold back to signed int32.
    */
  private def sqlMirrorHash(s: String, seed: Int): Int = {
    val hexStr = s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    val alphabet = "123456789abcdef" // strpos: '0' -> 0 (not found)
    val bs = hexStr.grouped(2).map { p =>
      (alphabet.indexOf(p(0)) + 1) * 16 + (alphabet.indexOf(p(1)) + 1)
    }.toArray
    val n = bs.length
    val na = n - n % 4
    var h = seed.toLong & M
    var i = 0
    while (i < na) {
      val k = bs(i) + 256L * bs(i + 1) + 65536L * bs(i + 2) + 16777216L * bs(i + 3)
      h = mixH1(h, k)
      i += 4
    }
    while (i < n) {
      val b = if (bs(i) >= 128) bs(i) + 4294967040L else bs(i).toLong
      h = mixH1(h, b)
      i += 1
    }
    val u = fmix(h, n.toLong)
    (if (u >= 2147483648L) u - 4294967296L else u).toInt
  }

  private def sparkHash(s: String, seed: Int): Int = {
    val u = UTF8String.fromString(s)
    Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }

  test("SQL mirror matches Spark murmur3 on fixed cases, both seeds") {
    val cases = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "three word shingle",
      "héllo wörld", "日本語テキスト", " mixed é", "€€€",
      "a" * 100
    )
    for (s <- cases; seed <- Seq(42, 1042)) {
      assert(sqlMirrorHash(s, seed) === sparkHash(s, seed), s"input=$s seed=$seed")
    }
  }

  test("SQL mirror matches Spark murmur3 on random strings") {
    val rng = new scala.util.Random(18)
    val pools = Seq(
      ('a' to 'z') ++ ('0' to '9') :+ ' ',          // ASCII tokens
      "éüßñ日本語한글€𝄞".toSeq,                      // multi-byte heavy
      (0 until 0xd7ff).map(_.toChar)                 // arbitrary BMP
    )
    for (_ <- 0 until 500) {
      val pool = pools(rng.nextInt(pools.length))
      val s = Seq.fill(rng.nextInt(40))(pool(rng.nextInt(pool.length))).mkString
      assert(sqlMirrorHash(s, 42) === sparkHash(s, 42), s"input=${s.take(40)}")
      assert(sqlMirrorHash(s, 1042) === sparkHash(s, 1042), s"input=${s.take(40)}")
    }
  }

  test("hashCtes embeds the nibble alphabet and both fold stages") {
    val sql = graft.operators.Murmur3Sql.hashCtes(42, "toks", "t")
    assert(sql.contains("123456789abcdef"))
    assert(sql.contains("list_reduce"))
    assert(sql.contains("4294967040")) // tail sign extension
  }

  /** JVM mirror of [[graft.operators.Murmur3Sql.hashLongSql]] /
    * hashIntSql — the same unsigned-32-in-Long arithmetic the SQL text
    * encodes (low/high word split, mixH1-with-embedded-mixK1, staged
    * fmix), so a transcription mistake in either builder fails here.
    */
  private def mirrorHashLong(x: Long, seedU: Long): Long = {
    val low = x & M
    val high = (x >>> 32) & M
    fmix(mixH1(mixH1(seedU, low), high), 8L)
  }
  private def mirrorHashInt(x: Int, seedU: Long): Long =
    fmix(mixH1(seedU, x.toLong & M), 4L)
  private def signed32(u: Long): Int =
    (if (u >= 2147483648L) u - 4294967296L else u).toInt

  test("escape hatch: hashLong/hashInt chain replays hash(array<long>, int)") {
    // representative band tuples: small minhash-slot values, plus
    // boundary longs exercising the high word and sign extension
    val tuples = Seq(
      Seq(123456789L, 42L, 987654321L, 2147480009L),
      Seq(0L, 1L, 2L, 3L),
      Seq(Long.MaxValue, Long.MinValue, -1L, 4294967296L)
    )
    for ((slots, band) <- tuples.zip(Seq(0, 7, 15))) {
      // ground truth 1: the JVM kernel chained exactly as Catalyst's
      // Murmur3Hash walks an array<long> column then an int column
      val kernel = Murmur3_x86_32.hashInt(
        band, slots.foldLeft(42)((s, x) => Murmur3_x86_32.hashLong(x, s)))
      // ground truth 2: Catalyst itself
      val spark = SparkTestSession.get
      import org.apache.spark.sql.functions.{hash, lit, typedLit}
      val catalyst = spark.range(1)
        .select(hash(typedLit(slots), lit(band)).as("h"))
        .head.getInt(0)
      assert(kernel === catalyst, s"kernel-vs-catalyst slots=$slots band=$band")
      // the SQL builders' arithmetic, mirrored step for step
      val chained = slots.foldLeft(42L & M)((s, x) => mirrorHashLong(x, s))
      assert(signed32(mirrorHashInt(band, chained)) === kernel,
        s"mirror slots=$slots band=$band")
    }
  }

  test("hashLongSql embeds the word split and both fmix lengths") {
    val sql = graft.operators.Murmur3Sql.hashLongSql("s", "42")
    assert(sql.contains(">> 32"))       // high-word extraction
    assert(sql.contains("& 4294967295")) // unsigned-32 masking
    val intSql = graft.operators.Murmur3Sql.hashIntSql("b", "42")
    // the length splice is the first xor of the fmix avalanche:
    // `xor(xor((h), (n)), (xor((h), (n))) >> 16)` — the exact marker
    // `, (n)), (xor(` pins n=8 (two 4-byte words) for the long builder
    // and n=4 for the int builder, not merely "an 8 appears somewhere"
    assert(sql.contains(", (8)), (xor("))
    assert(!sql.contains(", (4)), (xor("))
    assert(intSql.contains(", (4)), (xor("))
    assert(!intSql.contains(">> 32")) // no word split for a 4-byte input
    // both fmix multiply constants and the mixH1 additive constant must
    // survive any refactor of the builders
    for (text <- Seq(sql, intSql); c <- Seq("2246822507", "3266489909", "3864292196"))
      assert(text.contains(c), s"missing murmur3 constant $c")
    // the SQL text itself is executed against DuckDB every round by the
    // oracle gate: q_fn_hash_chain replays hash(array<long>, int)
    // through these builders (ScalarFunctionQueries), so bit-exactness
    // vs DuckDB is pinned by automation, not a one-off manual check
  }

  test("minhash perm VALUES replay MinHashSignature's own coefficients") {
    val values = graft.operators.Murmur3Sql.minhashPermsValues
    val as = graft.functions.MinHashSignature.As
    val bs = graft.functions.MinHashSignature.Bs
    assert(values.contains(s"(0, ${as(0)}, ${bs(0)})"))
    assert(values.contains(s"(63, ${as(63)}, ${bs(63)})"))
  }
}

package graft.query

/** Unsigned-64-bit arithmetic as DuckDB SQL expression fragments —
  * the primitive layer under the hash-replay oracles
  * ([[SimHashOracle]]'s xxHash64-of-strings, the Count-Min
  * xxHash64-of-longs + splitmix64 replay). Everything is generated,
  * never hand-copied, so the two replays cannot drift on the
  * arithmetic.
  *
  * Representation: values live in [0, 2^64) carried as UHUGEINT
  * (DuckDB's 128-bit unsigned — a 64x64-bit product needs up to 128
  * bits, and DuckDB raises on overflow rather than wrapping, so the
  * wider type IS the wrap). Rotations are the sum of two disjoint
  * shift-halves (`+` is `|` when the bit ranges don't overlap);
  * Java's signed `+`/`*`/`^`/`>>>` match these unsigned forms
  * bit-for-bit, which is what makes the JVM-side hashes replayable
  * at all. */
object SqlU64 {

  val M = "18446744073709551616::UHUGEINT"

  /** xxHash64 primes. */
  val P1 = "11400714785074694791::UHUGEINT"
  val P2 = "14029467366897019727::UHUGEINT"
  val P3 = "1609587929392839161::UHUGEINT"
  val P4 = "9650029242287828579::UHUGEINT"
  val P5 = "2870177450012600261::UHUGEINT"

  def mul(a: String, b: String): String = s"((($a) * ($b)) % $M)"
  def add(a: String, b: String): String = s"((($a) + ($b)) % $M)"
  def xor(a: String, b: String): String =
    s"xor(($a)::UHUGEINT, ($b)::UHUGEINT)"
  def shr(x: String, n: Int): String =
    s"(($x) // ${java.math.BigInteger.ONE.shiftLeft(n)}::UHUGEINT)"
  def rotl(x: String, r: Int): String =
    s"(((($x) * ${java.math.BigInteger.ONE.shiftLeft(r)}::UHUGEINT) % $M)" +
      s" + (($x) // ${java.math.BigInteger.ONE.shiftLeft(64 - r)}::UHUGEINT))"

  /** A signed BIGINT expression reinterpreted as its unsigned 64-bit
    * bit pattern. */
  def unsigned(x: String): String =
    s"((($x)::HUGEINT % 18446744073709551616::HUGEINT + " +
      s"18446744073709551616::HUGEINT)::UHUGEINT % $M)"

  /** The xxHash64 tail rounds + avalanche, shared by both replays. */
  def round8(h: String, lane: String): String =
    add(mul(rotl(xor(h, mul(rotl(mul(lane, P2), 31), P1)), 27), P1), P4)
  def round4(h: String, lane: String): String =
    add(mul(rotl(xor(h, mul(lane, P1)), 23), P2), P3)
  def round1(h: String, byte: String): String =
    mul(rotl(xor(h, mul(s"($byte)::UHUGEINT", P5)), 11), P1)
  def avalanche(h0: String): String = {
    val a = mul(xor(h0, shr(h0, 33)), P2)
    val b = mul(xor(a, shr(a, 29)), P3)
    xor(b, shr(b, 32))
  }

  /** xxHash64(seed 42) of one signed BIGINT — the engine's
    * `xxhash64(long)`: one 8-byte round over the little-endian value
    * (the lane IS the unsigned reinterpretation) then the avalanche.
    * Matches `functions.xxhash64` on LongType, which is what the
    * Count-Min / sketch key canonicalization feeds. */
  def hashLong(x: String): String = {
    val h0 = s"((42::UHUGEINT + $P5 + 8::UHUGEINT) % $M)"
    avalanche(round8(h0, unsigned(x)))
  }

  /** splitmix64 finalizer — `CountMinState.mix`'s avalanche. */
  def splitmix64(z0: String): String = {
    val c1 = "13787848793156543929::UHUGEINT" // 0xBF58476D1CE4E5B9
    val c2 = "10723151780598845931::UHUGEINT" // 0x94D049BB133111EB
    val a = mul(xor(z0, shr(z0, 30)), c1)
    val b = mul(xor(a, shr(a, 27)), c2)
    xor(b, shr(b, 31))
  }

  /** Little-endian lane of `n` bytes at 0-based offset expression
    * `off` over string column `s` — `ord` is the byte value because
    * every caller's soundness guard pins its corpus to ASCII. */
  private def lane(off: String, n: Int): String =
    (0 until n).map { k =>
      s"(ord(substr(s, ($off) + ${k + 1}, 1))::UHUGEINT * " +
        s"${java.math.BigInteger.ONE.shiftLeft(8 * k)}::UHUGEINT)"
    }.mkString("(", " + ", ")")

  /** The xxHash64(seed 42)-of-strings CTE chain — the engine's
    * `xxhash64(string)` (UTF-8 bytes, Spark's default seed) replayed
    * as pure SQL over the distinct strings of `src`'s column `s`,
    * ending in `xh(s, h)` with `h` the UBIGINT hash. Unrolled for
    * len < 32 ONLY (no stripe loop — up to three 8-byte rounds, one
    * optional 4-byte round, up to three 1-byte rounds, then the
    * avalanche; each round one CTE so the state threads as a column,
    * never a nested megaexpression). Callers MUST probe their corpus
    * (every hashed string ASCII and < 32 bytes) before emitting an
    * oracle around this — [[graft.query.SimHashOracle.soundDocs]] is
    * the model. Shared by the SimHash and DSIR replays so the two
    * cannot drift on the arithmetic. */
  def xxhStrCtes(src: String): String = {
    val h0 = add(s"(42::UHUGEINT + $P5)", "l::UHUGEINT")
    val b = new StringBuilder
    b ++= s"x0 AS (SELECT s, strlen(s) AS l, $h0 AS h\n" +
      s"      FROM (SELECT DISTINCT s FROM $src)),\n"
    for (c <- 0 until 3)
      b ++= s"x${c + 1} AS (SELECT s, l, CASE WHEN l >= ${8 * (c + 1)}" +
        s" THEN ${round8("h", lane((8 * c).toString, 8))}" +
        s" ELSE h END AS h FROM x$c),\n"
    val off4 = "((l // 8) * 8)"
    b ++= s"x4 AS (SELECT s, l, CASE WHEN l % 8 >= 4" +
      s" THEN ${round4("h", lane(off4, 4))} ELSE h END AS h FROM x3),\n"
    val offb = "((l // 8) * 8 + CASE WHEN l % 8 >= 4 THEN 4 ELSE 0 END)"
    for (k <- 0 until 3)
      b ++= s"x${5 + k} AS (SELECT s, l, CASE WHEN l % 4 >= ${k + 1}" +
        s" THEN ${round1("h", s"ord(substr(s, ($offb) + ${k + 1}, 1))")}" +
        s" ELSE h END AS h FROM x${4 + k}),\n"
    b ++= s"x8 AS (SELECT s, ${mul(xor("h", shr("h", 33)), P2)} AS h" +
      " FROM x7),\n"
    b ++= s"x9 AS (SELECT s, ${mul(xor("h", shr("h", 29)), P3)} AS h" +
      " FROM x8),\n"
    b ++= s"xh AS (SELECT s, (${xor("h", shr("h", 32))})::UBIGINT AS h" +
      " FROM x9)"
    b.toString
  }
}

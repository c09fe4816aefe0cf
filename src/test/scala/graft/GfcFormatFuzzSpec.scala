package graft

import java.io.{File, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftFeedFormat

/** Property fuzz of the `.gfc` binary format boundary.
  *
  * The round-8 writeShort bug class (signed 2-byte length truncation) was
  * found by review, not test — this suite closes that gap with
  * deterministic ScalaCheck-generated round-trips over arbitrary unicode
  * payloads and chunk counts, explicit byte-length boundary cases at the
  * 2-byte field limit (0, 32767, 32768, 65535 round-trip; 65536 rejects
  * loudly), and fail-loud reads of truncated / corrupted files.
  */
class GfcFormatFuzzSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Deterministic sample: same seed → same value, every run. */
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // unicode WITHOUT unpaired surrogates (String.getBytes(UTF_8) replaces
  // those with '?', which cannot round-trip by construction); includes
  // multibyte BMP chars and supplementary (4-byte) code points
  private val uniChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf(" ", "\n", "\t", "\u00e9", "\u00df", "\u4e2d", "\ud83d\ude42", "\u20ac"),
    2 -> Gen.choose(0x00A1, 0xD7FF).map(_.toChar.toString),
    1 -> Gen.choose(0x10000, 0x10FFFF).map(cp => new String(Character.toChars(cp))))

  private def uniString(maxChars: Int): Gen[String] =
    Gen.chooseNum(0, maxChars).flatMap(n =>
      Gen.listOfN(n, uniChar).map(_.mkString))

  private val rowGen: Gen[(Long, Long, Long, String, Double, String)] = for {
    id <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
    // micros bounded so the stored nanos (micros*1000) stay in Long
    tsm <- Gen.chooseNum(-9_000_000_000_000_00L, 9_000_000_000_000_00L)
    uid <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    et <- uniString(40)
    v <- Gen.oneOf(
      Gen.chooseNum(-1e18, 1e18),
      Gen.oneOf(0.0, -0.0, 1.5, -2.25, Double.MinPositiveValue))
    props <- uniString(120)
  } yield (id, tsm, uid, et, v, props)

  /** Write the tuples as a normalized feed, read back raw, compare as
    * multisets on the STORED encoding (ts in nanos). */
  private def roundTrip(rows: Seq[(Long, Long, Long, String, Double, String)],
      parts: Int): Unit = {
    val dir = Files.createTempDirectory("gfc-fuzz-").toString
    try {
      val orig = rows
        .toDF("event_id", "tsm", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      GraftFeedFormat.write(orig.repartition(parts), dir)
      val back = spark.read.format("graft.sources.GraftFeedSource").load(dir)
      val want = orig.select(col("event_id"),
        (expr("unix_micros(ts)") * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      assert(back.count() === rows.size.toLong)
      assert(back.exceptAll(want).count() === 0, s"extra rows (parts=$parts)")
      assert(want.exceptAll(back).count() === 0, s"lost rows (parts=$parts)")
    } finally {
      Files.walk(Paths.get(dir)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("round-trip holds over arbitrary unicode rows and partition counts") {
    (1 to 20).foreach { i =>
      val n = sample(Gen.chooseNum(1, 60), 1000L + i)
      val rows = (0 until n).map(j => sample(rowGen, i * 10000L + j))
      val parts = sample(Gen.chooseNum(1, 4), 2000L + i)
      roundTrip(rows, parts)
    }
  }

  test("round-trip holds across chunk boundaries (partial tail, exact fill, multi-chunk)") {
    // ChunkRows = 1000: exercise n-1 / n / n+1 and a 2-chunk+tail file
    Seq(999, 1000, 1001, 2200).foreach { n =>
      val rows = (0 until n).map(j =>
        (j.toLong, j.toLong * 1000, j.toLong, s"t$j", j * 0.5, s"p$j"))
      roundTrip(rows, 1)
    }
  }

  test("event_type byte-length boundary: 0 / 32767 / 32768 / 65535 round-trip") {
    // ASCII: byte length == char length. 32767 = Short.MaxValue,
    // 32768 = the sign-flip value the old signed decode read as negative,
    // 65535 = the 2-byte field max.
    val lens = Seq(0, 1, 32767, 32768, 65535)
    val rows = lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, i.toLong * 1000, i.toLong, "x" * l, 1.0, s"p$i")
    }
    roundTrip(rows, 1)
    // multibyte at the limit: 21845 × 3-byte '€' = 65535 bytes exactly
    assert("€".getBytes(StandardCharsets.UTF_8).length === 3)
    roundTrip(Seq((1L, 1000L, 1L, "€" * 21845, 1.0, "p")), 1)
  }

  test("event_type over the 2-byte limit is rejected loudly, not truncated") {
    def messages(e: Throwable): Seq[String] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
    Seq("x" * 65536, "€" * 21846).foreach { et =>
      val dir = Files.createTempDirectory("gfc-fuzz-rej-").toString
      val df = Seq((1L, 1000L, 1L, et, 1.0, "p"))
        .toDF("event_id", "tsm", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      val e = intercept[Throwable] { GraftFeedFormat.write(df, dir) }
      assert(messages(e).exists(_.contains("2-byte length limit")),
        s"wrong failure for ${et.length}-char event_type: $e")
    }
  }

  private def writeFixture(): (String, File) = {
    val dir = Files.createTempDirectory("gfc-fuzz-fix-").toString
    val rows = (0 until 50).map(j =>
      (j.toLong, j.toLong * 1000, j.toLong, s"evt$j", j * 1.0, s"props$j"))
    val df = rows
      .toDF("event_id", "tsm", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("tsm")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    GraftFeedFormat.write(df.repartition(1), dir)
    val f = new File(dir).listFiles().filter(_.getName.endsWith(".gfc")).head
    (dir, f)
  }

  private def corrupt(f: File)(mutate: RandomAccessFile => Unit): Unit = {
    val raf = new RandomAccessFile(f, "rw")
    try mutate(raf) finally raf.close()
  }

  test("corrupted magic fails loudly with a clear error") {
    val (dir, f) = writeFixture()
    // a second chunk-sized file with a flipped magic in a COPY, so the
    // original fixture stays valid for the other tests
    val bad = new File(dir, "zz-corrupt.gfc")
    Files.copy(f.toPath, bad.toPath, StandardCopyOption.REPLACE_EXISTING)
    corrupt(bad) { raf => raf.seek(0); raf.writeInt(0xDEADBEEF) }
    val e = intercept[Throwable] { GraftFeedFormat.listChunks(dir) }
    assert(Option(e.getMessage).exists(_.contains("bad .gfc chunk magic")),
      s"expected a magic error, got: $e")
  }

  test("truncated files fail loudly at plan or read time, never silently short") {
    val (_, f) = writeFixture()
    val full = Files.readAllBytes(f.toPath)
    // mid-header truncation (inside the 28-byte chunk header)
    val dir1 = Files.createTempDirectory("gfc-fuzz-t1-").toString
    Files.write(Paths.get(dir1, "part-00000.gfc"), full.take(20))
    val e1 = intercept[Throwable] { GraftFeedFormat.listChunks(dir1) }
    assert(e1.isInstanceOf[java.io.EOFException] ||
      Option(e1.getMessage).exists(_.contains("magic")), s"got: $e1")
    // mid-payload truncation: header intact, record bytes cut — the
    // DECODER must throw (EOF inside readFully/readLong), not return a
    // short result
    val dir2 = Files.createTempDirectory("gfc-fuzz-t2-").toString
    Files.write(Paths.get(dir2, "part-00000.gfc"), full.take(full.length - 7))
    val e2 = intercept[Throwable] {
      // listChunks tolerates the truncated TAIL listing (skipBytes stops
      // at EOF) — the decode is where the loss must surface
      spark.read.format("graft.sources.GraftFeedSource").load(dir2).collect()
    }
    def chain(e: Throwable) = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e2).exists(t => t.isInstanceOf[java.io.EOFException] ||
      Option(t.getMessage).exists(m => m.contains("EOF") || m.contains("magic"))),
      s"truncated payload did not fail loudly: $e2")
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.TokenShards
import graft.text.Bpe

/** i22: loader-ready token shards — write/read round-trip, header
  * invariants, commit atomicity, and the named failure modes.
  */
class TokenShardsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private val merges = Bpe.FixedMerges

  // small corpus: repeated words (frequency ranking is observable), a doc
  // long enough to straddle sequences, a zero-token doc, sparse ids
  private def fixture = Seq(
    (0L, "the cat and the hat and the cat again"),
    (1L, ("the quick brown fox jumps over the lazy dog " * 12).trim),
    (3L, ""),
    (5L, "and and and the the cat"),
    (8L, ("tokenization is the art of cutting text " * 9).trim)
  ).toDF("doc_id", "text")

  test("vocab: dense frequency-ranked ids, deterministic ties") {
    val v = TokenShards.vocab(fixture, "text", merges)
      .orderBy(col("token_id"))
      .as[(Int, String, Long)].collect().toSeq
    assert(v.map(_._1) == v.indices.map(_.toInt), "ids must be dense 0..V-1")
    // ranked by count desc, then subword asc — recompute and compare
    val want = v.map(r => (r._2, r._3)).sortBy { case (s, n) => (-n, s) }
    assert(v.map(r => (r._2, r._3)) == want, "vocab order must be (n_uses desc, subword asc)")
  }

  test("write → read round-trips exactly; partial tail dropped; header and " +
      "file layout match the spec (i22/q116)") {
    val docs = fixture
    val ids = TokenShards.tokenIdMap(TokenShards.vocab(docs, "text", merges))
    val dt = TokenShards.docTokens(docs, "doc_id", "text", merges, ids)
    val manifest = graft.ops.SequencePack.manifest(
      dt.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
      seqLen = 32, bucketSize = 4)
    val seqs = TokenShards.assemble(dt, manifest)
    val full = TokenShards.fullSequences(seqs, 32)
    val dir = tmp("tokshard") + "/shards"
    TokenShards.writeShards(full, dir, seqLen = 32, seqsPerShard = 3)

    val want = full.as[(Long, Seq[Int])].collect().toMap
    val got = TokenShards.readShards(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == want, "read-back must equal the manifest assembly exactly")
    assert(want.nonEmpty && want.values.forall(_.length == 32))
    // the corpus' partial tail exists (total tokens not divisible by 32)
    // and is NOT in the shards
    val all = seqs.as[(Long, Seq[Int])].collect().toMap
    val tail = all.keySet -- want.keySet
    assert(tail.size == 1 && all(tail.head).length < 32,
      s"expected exactly the partial tail dropped, got $tail")

    // file layout: shard s holds ids [3s, 3s+3), fixed-width, spec header
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tok"))
      .sortBy(_.getName)
    assert(files.nonEmpty)
    files.foreach { f =>
      val s = f.getName.stripPrefix("shard-").stripSuffix(".tok").toLong
      val bytes = Files.readAllBytes(f.toPath)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](8); bb.get(magic)
      assert(new String(magic, "US-ASCII") == "GRFTTOK1")
      assert(bb.getInt == 1, "version")
      assert(bb.getInt == 32, "seq_len")
      val firstSeq = bb.getLong
      val nSeqs = bb.getInt
      assert(firstSeq == s * 3, "shard file owns its seq range")
      assert(bytes.length == 32 + nSeqs.toLong * 32 * 4, "fixed-width body")
      // sequence k of the file at 32 + k*seqLen*4 — the mmap contract
      (0 until nSeqs).foreach { k =>
        val tok0 = bb.getInt(32 + k * 32 * 4)
        assert(tok0 == want(firstSeq + k).head, "seek-addressable sequence start")
      }
    }
    // every full sequence accounted across files, none duplicated
    val perFile = files.map { f =>
      val bb = java.nio.ByteBuffer.wrap(Files.readAllBytes(f.toPath))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(16); val first = bb.getLong; val n = bb.getInt
      (first until first + n).toSeq
    }.toSeq
    assert(perFile.flatten.sorted == want.keySet.toSeq.sorted)
  }

  test("writeShards is an atomic overwrite: rewrite replaces, a crashed " +
      "write leaves the previous shard set intact, no .inprogress leaks") {
    val base = tmp("tokatomic")
    val dir = s"$base/shards"
    def seqsOf(ids: Seq[Long], v: Int) =
      ids.map(i => (i, Seq.fill(4)(v))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqsOf(0L to 5L, 1), dir, seqLen = 4, seqsPerShard = 2)
    TokenShards.writeShards(seqsOf(0L to 3L, 2), dir, seqLen = 4, seqsPerShard = 2)
    val got = TokenShards.readShards(spark, dir).as[(Long, Seq[Int])].collect().toMap
    assert(got == (0L to 3L).map(i => i -> Seq.fill(4)(2)).toMap, "overwrite must replace")
    // crash mid-write: a null token fails the action — previous set survives
    val badDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(0L,
        Seq[Integer](1, null, 3, 4)))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("seq_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tokens",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType, containsNull = true)))))
    val e = intercept[Exception](
      TokenShards.writeShards(badDf, dir, seqLen = 4, seqsPerShard = 2))
    assert(e.getMessage != null)
    val after = TokenShards.readShards(spark, dir).as[(Long, Seq[Int])].collect().toMap
    assert(after == got, "crashed write must leave the previous shards intact")
    val leftovers = new java.io.File(base).listFiles().map(_.getName)
      .filter(n => n.contains("__tmp") || n.contains("__old"))
    assert(leftovers.isEmpty, s"swap left garbage: ${leftovers.toSeq}")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".inprogress")), "no .inprogress leaks")
  }

  test("named failures: sequence gap, wrong length, corrupt read") {
    val dir = tmp("toknamed")
    def seqsOf(ids: Seq[Long]) =
      ids.map(i => (i, Seq.fill(4)(7))).toDF("seq_id", "tokens")
    // gap within a shard
    val gap = intercept[Exception](TokenShards.writeShards(
      seqsOf(Seq(0L, 1L, 3L)), s"$dir/gap", seqLen = 4, seqsPerShard = 4))
    assert(gap.getMessage.contains("gap"), gap.getMessage)
    // gap exactly ON a shard boundary: invisible to any single task
    // (each shard is internally consecutive) — the global range check
    // must catch it, and the failed write must not publish
    val bgap = intercept[Exception](TokenShards.writeShards(
      seqsOf(Seq(0L, 1L, 3L)), s"$dir/bgap", seqLen = 4, seqsPerShard = 2))
    assert(bgap.getMessage.contains("gap between shards"), bgap.getMessage)
    assert(!new java.io.File(s"$dir/bgap").exists(),
      "a gap-failed write must not publish a shard set")
    // head gap relative to nothing is fine (streaming starts mid-shard) —
    // a sparse but internally contiguous range still writes
    TokenShards.writeShards(seqsOf(Seq(5L, 6L, 7L)), s"$dir/mid",
      seqLen = 4, seqsPerShard = 2)
    assert(TokenShards.readShards(spark, s"$dir/mid").count() == 3)
    // wrong length
    val short = intercept[Exception](TokenShards.writeShards(
      Seq((0L, Seq(1, 2))).toDF("seq_id", "tokens"), s"$dir/short",
      seqLen = 4, seqsPerShard = 4))
    assert(short.getMessage.contains("fullSequences"), short.getMessage)
    // corrupt magic / truncated body fail NAMED on read
    TokenShards.writeShards(seqsOf(0L to 1L), s"$dir/ok", seqLen = 4, seqsPerShard = 4)
    val f = new java.io.File(s"$dir/ok").listFiles()
      .filter(_.getName.endsWith(".tok")).head
    // drop Hadoop's local-FS checksum sidecars: the corruption must reach
    // OUR parser, not the ChecksumFileSystem
    new java.io.File(s"$dir/ok").listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val bytes = Files.readAllBytes(f.toPath)
    bytes(0) = 'X'.toByte
    Files.write(f.toPath, bytes)
    val bad = intercept[Exception](
      TokenShards.readShards(spark, s"$dir/ok").collect())
    assert(bad.getMessage.contains("bad magic") ||
      bad.getCause != null && bad.getCause.getMessage.contains("bad magic"))
    bytes(0) = 'G'.toByte
    Files.write(f.toPath, bytes.dropRight(4))
    val trunc = intercept[Exception](
      TokenShards.readShards(spark, s"$dir/ok").collect())
    val msg = Option(trunc.getMessage).getOrElse("") +
      Option(trunc.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    // the manifest length cross-check catches truncation BEFORE the
    // parser would ("body length" remains the manifest-less backstop)
    assert(msg.contains("manifest says") || msg.contains("body length"), msg)
  }

  test("docTokens fails NAMED when the vocab does not cover the corpus") {
    val docs = Seq((0L, "alpha beta gamma delta " * 8)).toDF("doc_id", "text")
    val ids = TokenShards.tokenIdMap(TokenShards.vocab(
      Seq((0L, "alpha alpha")).toDF("doc_id", "text"), "text", merges))
    val dt = TokenShards.docTokens(docs, "doc_id", "text", merges, ids)
    val manifest = graft.ops.SequencePack.manifest(
      dt.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens", seqLen = 8)
    val seqs = TokenShards.fullSequences(TokenShards.assemble(dt, manifest), 8)
    val e = intercept[Exception](TokenShards.writeShards(
      seqs, tmp("tokvocab") + "/s", seqLen = 8, seqsPerShard = 4))
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("vocab"), msg)
  }

  test("q115 ∘ i22: shards written under the SHUFFLED manifest round-trip " +
      "and hold the same token multiset as id-order shards") {
    val docs = fixture
    val ids = TokenShards.tokenIdMap(TokenShards.vocab(docs, "text", merges))
    val dt = TokenShards.docTokens(docs, "doc_id", "text", merges, ids)
    val plainAsm = TokenShards.assemble(dt, graft.ops.SequencePack.manifest(
        dt.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
        seqLen = 16, bucketSize = 4))
      .as[(Long, Seq[Int])].collect().toMap
    val shufAsm = TokenShards.assemble(dt, graft.ops.SequencePack.shuffled(
        dt.select(col("doc_id"), col("n_tokens")), "doc_id", "n_tokens",
        seqLen = 16, seed = "mix1"))
      .as[(Long, Seq[Int])].collect().toMap
    // the permutation moves every token, loses none: same multiset over
    // the WHOLE assembly (the dropped tail differs, so compare pre-drop)
    def bag(m: Map[Long, Seq[Int]]) =
      m.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    assert(bag(shufAsm) == bag(plainAsm), "shuffle must not lose or invent tokens")
    assert(shufAsm.count(_._2.length == 16) == plainAsm.count(_._2.length == 16))
    assert(shufAsm != plainAsm, "the shuffled layout must differ from id order")
    // and the shuffled layout writes + reads back exactly like id order
    val dir = tmp("tokshuf") + "/s"
    val full = shufAsm.filter(_._2.length == 16)
    TokenShards.writeShards(full.toSeq.toDF("seq_id", "tokens"),
      dir, seqLen = 16, seqsPerShard = 4)
    val back = TokenShards.readShards(spark, dir)
      .as[(Long, Seq[Int])].collect().toMap
    assert(back == full, "shuffled shards must round-trip byte-exactly")
  }

  test("_SHARDS manifest: a lost or injected shard file fails the read NAMED " +
      "instead of silently shrinking the corpus") {
    val dir = tmp("tokmanifest") + "/s"
    val seqs = (0L to 7L).map(i => (i, Seq.fill(4)(i.toInt))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqs, dir, seqLen = 4, seqsPerShard = 2)
    val d = new java.io.File(dir)
    assert(new java.io.File(d, "_SHARDS").isFile, "writer must land the manifest")
    val before = TokenShards.readShards(spark, dir).count()
    assert(before == 8)
    // lose one shard file (and its crc sidecar): the read must fail named
    val victim = d.listFiles().filter(_.getName.endsWith(".tok")).sortBy(_.getName).apply(1)
    val bytes = Files.readAllBytes(victim.toPath)
    victim.delete()
    d.listFiles().filter(_.getName == s".${victim.getName}.crc").foreach(_.delete())
    val lost = intercept[RuntimeException](TokenShards.readShards(spark, dir))
    assert(lost.getMessage.contains("missing shard-"), lost.getMessage)
    // an injected file the writer never committed is equally fatal
    Files.write(victim.toPath, bytes)
    Files.write(new java.io.File(d, "shard-000099.tok").toPath, bytes)
    val extra = intercept[RuntimeException](TokenShards.readShards(spark, dir))
    assert(extra.getMessage.contains("unexpected shard-000099"), extra.getMessage)
    new java.io.File(d, "shard-000099.tok").delete()
    // a SAME-NAMED stale shard (right name, wrong range) is caught by the
    // header/length cross-check — internal consistency is not enough
    val other = d.listFiles().filter(_.getName.endsWith(".tok")).sortBy(_.getName)
    val stale = Files.readAllBytes(other.head.toPath) // shard-000000's bytes
    Files.write(victim.toPath, stale)                 // masquerade as shard-000001
    d.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val swap = intercept[RuntimeException](TokenShards.readShards(spark, dir))
    assert(swap.getMessage.contains("disagrees with _SHARDS"), swap.getMessage)
    Files.write(victim.toPath, bytes)
    // .tok files WITHOUT a manifest = an interrupted write — must fail,
    // not serve a silently-partial corpus (an empty dir passes)
    new java.io.File(d, "_SHARDS").delete()
    d.listFiles().filter(_.getName == "._SHARDS.crc").foreach(_.delete())
    val nomf = intercept[RuntimeException](TokenShards.readShards(spark, dir))
    assert(nomf.getMessage.contains("lack a _SHARDS"), nomf.getMessage)
  }

  test("tokenIdMap caps the driver collect NAMED") {
    val v = TokenShards.vocab(fixture, "text", merges)
    val e = intercept[IllegalArgumentException](TokenShards.tokenIdMap(v, maxVocab = 3))
    assert(e.getMessage.contains("maxVocab"))
  }

  test("dtype u2: half-width shards round-trip exactly, manifest and header " +
      "agree, an id past 65535 fails NAMED") {
    val dir = tmp("tok_u2")
    val seqs = (0L until 6L).map(i =>
      (i, Seq(0, 1, 65535, (i * 777).toInt % 65536))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqs, s"$dir/shards", seqLen = 4,
      seqsPerShard = 2, dtype = "u2")
    val back = TokenShards.readShards(spark, s"$dir/shards")
      .as[(Long, Seq[Int])].collect().toMap
    assert(back == (0L until 6L).map(i =>
      (i, Seq(0, 1, 65535, (i * 777).toInt % 65536))).toMap)
    // files are genuinely half-width: 32 + 2 seqs x 4 tokens x 2 bytes
    val f = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".tok")).head
    assert(f.length == 32 + 2 * 4 * 2, s"u2 shard is ${f.length} bytes")
    // the set manifest declares the dtype
    val mf = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shards/${TokenShards.ManifestName}")))
    assert(mf.contains("\"dtype\":\"u2\""), mf)
    // overflow fails named, never wraps
    val big = Seq((0L, Seq(1, 2, 3, 65536))).toDF("seq_id", "tokens")
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.writeShards(big, s"$dir/of", seqLen = 4,
        seqsPerShard = 2, dtype = "u2")
    }
    assert(e.getMessage.contains("does not fit dtype u2"), e.getMessage)
    // an unknown dtype fails named up front
    val bad = intercept[IllegalArgumentException] {
      TokenShards.writeShards(seqs, s"$dir/bad", seqLen = 4,
        seqsPerShard = 2, dtype = "f8")
    }
    assert(bad.getMessage.contains("unknown token dtype"), bad.getMessage)
  }

  test("a corrupted header dtype code fails validation NAMED — never parses " +
      "as int32 by default") {
    val dir = tmp("tok_badcode")
    val seqs = (0L until 2L).map(i => (i, Seq(1, 2, 3, 4))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqs, s"$dir/shards", seqLen = 4, seqsPerShard = 2)
    val f = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".tok")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(28) = 7 // dtype code bytes are 28..31 LE
    java.nio.file.Files.write(f.toPath, bytes)
    // drop the local-FS checksum sidecar so the corruption reaches the
    // header parser rather than tripping the CRC first
    java.nio.file.Files.deleteIfExists(
      new java.io.File(f.getParentFile, s".${f.getName}.crc").toPath)
    val e = intercept[RuntimeException] {
      TokenShards.readShards(spark, s"$dir/shards")
    }
    assert(e.getMessage.contains("unknown token dtype code 7"), e.getMessage)
  }

  test("dtype u2: a stale i4 file under a u2 manifest fails the read NAMED") {
    val dir = tmp("tok_u2_stale")
    val seqs = (0L until 2L).map(i => (i, Seq(1, 2, 3, 4))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqs, s"$dir/shards", seqLen = 4,
      seqsPerShard = 2, dtype = "u2")
    // same-named i4 write into a sibling, then swap the FILE in (the
    // stale-snapshot failure the header check exists for)
    TokenShards.writeShards(seqs, s"$dir/other", seqLen = 4,
      seqsPerShard = 2, dtype = "i4")
    val name = new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.endsWith(".tok")).head.getName
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/other/$name"),
      java.nio.file.Paths.get(s"$dir/shards/$name"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val e = intercept[RuntimeException] {
      TokenShards.readShards(spark, s"$dir/shards")
    }
    assert(e.getMessage.contains("manifest says") ||
      e.getMessage.contains("disagrees with"), e.getMessage)
  }

  test("epochPlan: per-epoch seeded permutation, bit-replayable, addresses " +
      "seek to the exact sequence bytes in the written u2 layout (q121)") {
    val dir = tmp("tok_epoch")
    val n = 10
    val seqs = (0L until n.toLong).map(i =>
      (i, (0 until 4).map(k => (i * 10 + k).toInt))).toDF("seq_id", "tokens")
    TokenShards.writeShards(seqs, s"$dir/shards", seqLen = 4,
      seqsPerShard = 3, dtype = "u2")
    val full = seqs.select(col("seq_id"))
    val plan = TokenShards.epochPlan(full, epochs = 3, seed = "s17",
      seqLen = 4, seqsPerShard = 3, dtype = "u2")
      .as[(Long, Long, Long, Long, Long)].collect()
    // 3 epochs x n sequences; positions are a permutation 0..n-1 per epoch
    assert(plan.length == 3 * n)
    plan.groupBy(_._1).foreach { case (e, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until n.toLong),
        s"epoch $e positions")
      assert(rows.map(_._3).sorted.toSeq == (0L until n.toLong),
        s"epoch $e seq ids")
    }
    // bit-replay: the same seed derives the identical plan
    val replay = TokenShards.epochPlan(full, epochs = 3, seed = "s17",
      seqLen = 4, seqsPerShard = 3, dtype = "u2")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(plan.sorted.toSeq == replay.sorted.toSeq)
    // epochs genuinely differ (a re-shuffle, not a replay of epoch 0)
    val order = (e: Long) => plan.filter(_._1 == e).sortBy(_._2).map(_._3).toSeq
    assert(order(0L) != order(1L) || order(1L) != order(2L),
      "all epochs ordered identically — the shuffle is not per-epoch")
    // the plan's addresses are REAL: seek each (shard, byte_offset) in the
    // written files and the bytes parse to exactly that sequence's tokens
    plan.filter(_._1 == 1L).foreach { case (_, _, seqId, shard, off) =>
      val f = new java.io.File(f"$dir/shards/shard-$shard%06d.tok")
      val ch = java.nio.file.Files.newByteChannel(f.toPath)
      val bb = java.nio.ByteBuffer.allocate(4 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      try { ch.position(off); ch.read(bb) } finally ch.close()
      bb.flip()
      val toks = (0 until 4).map(_ => bb.getShort & 0xFFFF)
      assert(toks == (0 until 4).map(k => (seqId * 10 + k).toInt),
        s"seek at shard $shard offset $off")
    }
  }
}

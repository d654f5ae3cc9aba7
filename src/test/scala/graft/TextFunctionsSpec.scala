package graft

import org.apache.spark.sql.functions._

import graft.functions.{LexiconSentiment, TextFunctions}

/** Golden-pair parity with the reference's cleaning functions (outputs
  * recorded by executing the reference — scripts/ref_clean_truth.py) plus
  * unit coverage of the text-analysis scalar functions.
  */
class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def runBoth(texts: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    texts.toDF("t")
      .select(cleanTweetText(col("t")), cleanTextScraper(col("t")))
      .as[(String, String)].collect().toSeq
  }

  // (input, reference clean_tweet_text, reference scraper clean_text)
  private val golden = Seq(
    ("Check https://x.com/a/status/1 and http://t.co/xyz now",
      "check and now", "Check [LINK] and [LINK] now"),
    ("Halo @user1 dan @user_2! #MBG #makan_gratis",
      "halo [mention] dan [mention]! [hashtag] [hashtag]",
      "Halo [MENTION] dan [MENTION]! MBG makan_gratis"),
    ("  spaces\t\tand\nnewlines  ", "spaces and newlines", "spaces and newlines"),
    ("UPPER Case MiXeD", "upper case mixed", "UPPER Case MiXeD"),
    ("www.example.com plain", "plain", "[LINK] plain"),
    ("#tag1#tag2 @a@b", "[hashtag][hashtag] [mention][mention]",
      "tag1tag2 [MENTION][MENTION]"),
    ("", "", ""),
    ("no noise at all", "no noise at all", "no noise at all"),
    ("akhir url https://t.co/abc", "akhir url", "akhir url [LINK]"),
    // Unicode-whitespace/word cases (CPython-executed against the
    // reference regexes — the (?U) flag on the Spark chains makes \S stop
    // at NBSP, @\w+ eat accented handles, and \s+ collapse U+3000/U+2028
    // exactly like Python's re over str)
    ("halo dunia ", "halo dunia", "halo dunia"),
    ("cek http://x.co lanjut", "cek lanjut", "cek [LINK] lanjut"),
    ("@café_user halo", "[mention] halo", "[MENTION] halo"),
    ("#tagé x", "[hashtag] x", "tagé x"),
    ("a　b", "a b", "a b"),
    (" line ", "line", "line"))

  test("F1/F2 cleaning matches the executed reference byte-for-byte") {
    val got = runBoth(golden.map(_._1))
    golden.zip(got).foreach { case ((in, f1, f2), (g1, g2)) =>
      assert(g1 == f1, s"F1 mismatch for ${in.take(40)}")
      assert(g2 == f2, s"F2 mismatch for ${in.take(40)}")
    }
  }

  test("langId detects CJK text via substring matching (no \\b)") {
    import spark.implicits._
    val rows = Seq(
      "the cat is on the mat and the dog",  // en
      "der hund ist nicht das problem",     // de
      "我在这里 这是我的书 我们在了",          // zh — \b-based matching would yield 'und'
      "xyzzy qwerty")                       // no stopword hits at all
      .toDF("t").select(langId(col("t"))).as[String].collect().toSeq
    assert(rows == Seq("en", "de", "zh", "und"))
  }

  test("langId ties resolve to LangStopwords order") {
    import spark.implicits._
    // 'es' list has "es"; 'de' list has "ist"... craft a tie between en and fr
    val r = Seq("the le").toDF("t").select(langId(col("t"))).as[String].head()
    assert(r == "en") // en precedes fr in the priority order
  }

  test("token counts and fingerprint basics") {
    import spark.implicits._
    val df = Seq(("a bb  ccc", 3L), ("", 0L), ("x", 1L)).toDF("t", "n")
    val got = df.select(tokenCount(col("t")).cast("long"), col("n")).as[(Long, Long)].collect()
    got.foreach { case (g, e) => assert(g == e) }
    // fingerprint: deterministic, 0 for empty, distinct for distinct text
    val fps = Seq("", "abc", "abd").toDF("t")
      .select(fingerprint(col("t"))).as[Long].collect().toSeq
    assert(fps.head == 0L)
    assert(fps(1) != fps(2))
    // Karp–Rabin fold, base 31 mod 1e9+7, seeded with first codepoint:
    // "abc" -> (('a'*31 + 'b') * 31 + 'c') mod p
    val expected = (('a'.toLong * 31 + 'b'.toLong) * 31 + 'c'.toLong) % 1000000007L
    assert(fps(1) == expected)
  }

  test("lexicon sentiment labels and confidence") {
    import spark.implicits._
    val lex = LexiconSentiment.EngineWords
    val rows = Seq(
      "fast good great stuff",  // 3 pos, 0 neg
      "slow bad error",         // negative
      "fast slow",              // tie -> neutral, conf 0
      "nothing relevant")       // no signal -> neutral, conf 0.0
      .toDF("t")
      .select(LexiconSentiment.label(col("t"), lex),
        LexiconSentiment.confidence(col("t"), lex))
      .as[(String, Double)].collect().toSeq
    assert(rows(0) == ("positive", 1.0))
    assert(rows(1) == ("negative", 1.0))
    assert(rows(2) == ("neutral", 0.0))
    assert(rows(3) == ("neutral", 0.0))
  }

  test("hitPattern escapes metacharacters and boundaries accented words correctly") {
    import spark.implicits._
    // regex metacharacters in a dictionary word must match literally
    val metaWords = Seq("c++", "a.b", "x(y)")
    val got = Seq("i know c++ and a.b but not axb or xy")
      .toDF("t").select(TextFunctions.wordHits(col("t"), metaWords))
      .as[Int].head()
    // 'c++' literal hit + 'a.b' literal hit; 'axb' must NOT count ('.')
    // and 'x(y)' is absent
    assert(got == 2)
    // accented Latin words are outside Java's ASCII \b word class: they
    // must match as substrings (old >127 split already did this; the new
    // partition keys on the \w class instead)
    val acc = Seq("l'été est arrivé").toDF("t")
      .select(TextFunctions.wordHits(col("t"), Seq("été"))).as[Int].head()
    assert(acc == 1)
    // pure-ASCII words keep word boundaries: no substring inflation
    val bounded = Seq("the theme anthem").toDF("t")
      .select(TextFunctions.wordHits(col("t"), Seq("the"))).as[Int].head()
    assert(bounded == 1)
    // apostrophe words keep boundaries (edges are word chars)
    val apo = Seq("you can't say that but can'tx isn't it").toDF("t")
      .select(TextFunctions.wordHits(col("t"), Seq("can't"))).as[Int].head()
    assert(apo == 1) // can'tx must NOT count
    // multi-word phrases keep their \b anchors: 'berterima kasih' must NOT
    // count as 'terima kasih' (regression: the phrase briefly lost its
    // boundaries when partitioning keyed on all-word-chars)
    val phrase = Seq("saya berterima kasih atas terima kasih anda").toDF("t")
      .select(TextFunctions.wordHits(col("t"), Seq("terima kasih"))).as[Int].head()
    assert(phrase == 1)
  }

  test("pyStrip matches CPython str.strip() on the whitespace classes") {
    import spark.implicits._
    // goldens executed by CPython 3: `c.strip()` — the reference's gates
    // (resilient_scraper.py:399,597) use Python strip, which removes ALL
    // Unicode whitespace, where Spark's trim removes only ASCII spaces
    val golden = Seq(
      ("", ""), ("   ", ""), ("\t", ""), ("\n\n \r", ""),
      (" x ", "x"),          // NBSP: trim would keep it
      ("　ab　", "ab"),        // ideographic space
      (" ab\tcd \n", "ab\tcd"),        // interior whitespace survives
      ("abc \t\n", "abc"), ("", ""), ("no-ws", "no-ws"))
    val got = golden.map(_._1).toDF("t")
      .select(TextFunctions.pyStrip(col("t"))).as[String].collect().toSeq
    golden.map(_._2).zip(got).foreach { case (exp, g) => assert(g == exp) }
    // and the two reference gates flip on exactly these inputs:
    // "abc \t\n" measures 3 (dropped by the 5-char gate), a tab-only
    // location is an empty location
    val kept = operators.TweetOps.minLengthFilter(
      Seq("abc \t\n", "abcde", "ab    ").toDF("text"))
      .as[String].collect().toSeq
    assert(kept == Seq("abcde"))
    val loc = Seq("\t", "jakarta").toDF("l")
      .select(operators.TweetOps.locationFromString(col("l")).isNull).as[Boolean].collect().toSeq
    assert(loc == Seq(true, false))
  }

  test("PyWsRe2Class (the oracle's strip class) == Java (?U)\\s, char by char") {
    // The load-bearing equivalence behind exactDedupSql: the literal the
    // DuckDB oracle interpolates must denote exactly the set pyStrip's
    // (?U)\s strips. Both engines parse the SAME string; this pins the
    // Java interpretation over the BMP's whitespace-bearing range (the
    // RE2 side is exercised by every oracle run). A drift on either side
    // of the class breaks this before it can break the correctness gate.
    val cls = java.util.regex.Pattern.compile(TextFunctions.PyWsRe2Class)
    val uws = java.util.regex.Pattern.compile("(?U)\\s")
    (1 until 0x3100).map(_.toChar.toString).foreach { ch =>
      assert(cls.matcher(ch).matches() == uws.matcher(ch).matches(),
        f"class vs (?U)\\s disagree on U+${ch.codePointAt(0)}%04X")
    }
    // spot high/odd codepoints: BOM and Mongolian vowel separator are NOT
    // whitespace (neither side may strip them)
    Seq('\uFEFF', '\u180E').foreach { c =>
      assert(!cls.matcher(c.toString).matches() && !uws.matcher(c.toString).matches())
    }
  }

  test("x1c-x1f residue: CPython strips the separator chars, both engines here keep them (pinned divergence)") {
    import spark.implicits._
    // THE documented pyStrip residue, pinned by executed-CPython goldens:
    // \x1c-\x1f (file/group/record/unit separators) satisfy CPython's
    // str.isspace() — `[chr(i).isspace() for i in range(0x1c,0x20)]` is
    // [True]*4 — but are NOT Unicode White_Space, so Java's (?U)\s and
    // the oracle's PyWsRe2Class both leave them in place. Goldens
    // executed by CPython 3 (`c.strip()`):
    //   '\x1cabc\x1d'        -> 'abc'
    //   '\x1c\x1d\x1e\x1f'   -> ''
    //   ' \x1c x \x1f '      -> 'x'
    //   '\x1c \t xyz \x1f\n' -> 'xyz'
    // This spec asserts the divergence in BOTH directions so a future
    // JDK/regex change on either side fails HERE (named), not as a hash
    // mismatch in a distant q_exact_dedup oracle run: (1) pyStrip keeps
    // the separators (so it does NOT follow CPython on these inputs);
    // (2) the RE2 class the DuckDB oracles interpolate keeps them too —
    // the two ENGINES stay agreed even where both diverge from CPython.
    val inputs = Seq("\u001Cabc\u001D", "\u001C\u001D\u001E\u001F",
      " \u001C x \u001F ", "\u001C \t xyz \u001F\n")
    val cpython = Seq("abc", "", "x", "xyz")
    val oursExpected = Seq("\u001Cabc\u001D", "\u001C\u001D\u001E\u001F",
      "\u001C x \u001F", "\u001C \t xyz \u001F")
    val got = inputs.toDF("t")
      .select(TextFunctions.pyStrip(col("t"))).as[String].collect().toSeq
    got.zip(oursExpected).zip(cpython).foreach { case ((g, exp), py) =>
      assert(g == exp,
        "pyStrip drifted on a \\x1c-\\x1f input — the documented " +
          "CPython-whitespace residue changed sides; re-audit every " +
          "Python-strip-parity oracle (q_exact_dedup et al.)")
      assert(g != py, "pyStrip now strips \\x1c-\\x1f like CPython — the " +
        "documented residue no longer exists; update TextFunctions docs " +
        "AND PyWsRe2Class together or the oracles diverge")
    }
    // char-level pin on both sides of the oracle equivalence
    val cls = java.util.regex.Pattern.compile(TextFunctions.PyWsRe2Class)
    val uws = java.util.regex.Pattern.compile("(?U)\\s")
    (0x1c to 0x1f).map(_.toChar.toString).foreach { ch =>
      assert(!uws.matcher(ch).matches(),
        f"JDK (?U)\\s now matches U+${ch.codePointAt(0)}%04X — pyStrip no longer keeps \\x1c-\\x1f")
      assert(!cls.matcher(ch).matches(),
        f"PyWsRe2Class now matches U+${ch.codePointAt(0)}%04X — oracle strip class drifted")
    }
  }

  test("nfcNormalize composes combining sequences, is idempotent, preserves NFC input") {
    import spark.implicits._
    val decomposed = "cafe\u0301"            // e + COMBINING ACUTE
    val precomposed = "caf\u00e9"            // é already NFC
    val decomposedRing = "A\u030Angstro\u0308m"
    val precomposedRing = "\u00c5ngstr\u00f6m"
    val out = Seq(decomposed, precomposed, decomposedRing, "plain ascii", "").toDF("t")
      .select(TextFunctions.nfcNormalize($"t").as("n"), length($"t").as("lr"),
        length(TextFunctions.nfcNormalize($"t")).as("ln"))
      .collect()
    assert(out(0).getString(0) === precomposed && out(0).getInt(1) === 5 && out(0).getInt(2) === 4)
    assert(out(1).getString(0) === precomposed && out(1).getInt(2) === 4)
    assert(out(2).getString(0) === precomposedRing)
    assert(out(3).getString(0) === "plain ascii")
    assert(out(4).getString(0) === "")
    // idempotence: the second pass is the identity
    val twice = Seq(decomposed).toDF("t")
      .select(TextFunctions.nfcNormalize(TextFunctions.nfcNormalize($"t"))).head().getString(0)
    assert(twice === precomposed)
  }

  test("nfc_normalize registers as SQL, runs codegen'd, and nulls propagate") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = Seq(Some("cafe\u0301"), None).toDF("t")
    val viaSql = df.selectExpr("nfc_normalize(t)").collect()
    assert(viaSql(0).getString(0) === "caf\u00e9" && viaSql(1).isNullAt(0))
    // native expression participates in whole-stage codegen (no UDF gap);
    // must run over a FILE scan — a local Seq constant-folds into a
    // LocalTableScan with nothing left to codegen
    val q = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(TextFunctions.nfcNormalize(col("text")).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the LINE carrying the expression must be inside a codegen span — a
    // whole-plan contains("*(") check stays green off the scan's span
    // even when the Project falls back to interpreted eval
    val exprLine = plan.linesIterator.find(_.contains("nfc_normalize")).getOrElse("")
    assert(exprLine.contains("*("),
      s"nfc_normalize projection not codegen'd: '$exprLine'\n$plan")
    assert(!plan.contains("ScalaUDF"))
  }

  test("gate corpora are pure ASCII (precondition for the ASCII-class oracles)") {
    import spark.implicits._
    // The cleaning/dedup oracles keep RE2's ASCII classes while the Spark
    // chains are (?U)-Unicode; they agree BECAUSE the corpora contain no
    // non-ASCII text. If a regenerated corpus ever breaks this, fail here
    // with a clear message instead of as an opaque oracle hash mismatch.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val offenders = Tables(spark, sf, "documents")
        .filter(col("text").rlike("[^\\x01-\\x7F]")).count()
      assert(offenders == 0,
        s"$sf/documents contains $offenders non-ASCII rows: the ASCII-class " +
          "DuckDB oracles no longer match the (?U) Spark chains — regenerate " +
          "the oracle regexes from PyWsRe2Class-style shared constants")
    }
  }

  test("stem_indonesian: rule cascade on canonical affixed forms") {
    import org.apache.spark.sql.graft.StemIndonesian.stem
    // particles / possessives / prefixes / suffixes, in cascade
    assert(stem("makanlah") == "makan")     // particle; -an blocked by min-4
    assert(stem("bukunya") == "buku")
    assert(stem("makanannya") == "makan")   // -nya, then -an (5 >= 4 remain)
    assert(stem("berjalan") == "jalan")     // ber-; -an blocked by min-4
    assert(stem("dipukul") == "pukul")
    assert(stem("mengambil") == "ambil")
    assert(stem("diperbaiki") == "baik")    // two prefixes + -i
    assert(stem("keadilan") == "adil")      // ke- + -an
    assert(stem("sebesar") == "besar")
    assert(stem("terbaik") == "baik")
    // guards: short words never strip below the minimum stem
    assert(stem("laci") == "laci")          // -i would leave 3 < 4
    assert(stem("aku") == "aku")
    // two prefix strips + a derivational suffix
    assert(stem("mempertahankan") == "tahan")
    // the documented simplifications: no recoding of elided consonants,
    // and no root dictionary — so a root ENDING in a particle spelling
    // false-strips (sekolah's 'lah' is part of the word)
    assert(stem("menyanyi") == "anyi")
    assert(stem("sekolah") == "seko")
    // distributed expression path equals the driver function
    import spark.implicits._
    val words = Seq("makanlah", "bukunya", "berjalan", "dipukul", "xy").toDF("w")
    val viaExpr = words.select(
        org.apache.spark.sql.graft.StemIndonesianExpr.stemIndonesian($"w"))
      .as[String].collect().toSeq
    assert(viaExpr == Seq("makanlah", "bukunya", "berjalan", "dipukul", "xy").map(stem))
    // SQL registration
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    assert(spark.sql("SELECT stem_indonesian('terindah')").head.getString(0) ==
      stem("terindah"))
  }
}

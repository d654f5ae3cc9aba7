package graft

import org.apache.spark.sql.functions._

import graft.functions.{DictionaryLocator, DifflibRatio}
import graft.operators.FuzzyLocator

/** Bit-level parity of the Scala difflib engine with CPython.
  *
  * Goldens were produced by running the EXACT partial_ratio algorithm of
  * scripts/ref_fuzzy_truth.py (fuzzywuzzy's published partial_ratio over
  * stdlib difflib.SequenceMatcher, the scoring the reference environment
  * actually executes) under python3 over a battery that exercises every
  * fidelity-sensitive branch: typos, containment, empty/degenerate
  * inputs, the .995 early exit, banker's rounding, non-ASCII code
  * points, and — critically — autojunk (len(b) >= 200 drops popular
  * elements from match seeding: the 'abc'+x*250 vs x*250+'abc' pair
  * scores 2, not 100, and any implementation skipping autojunk fails it).
  */
class DifflibRatioSpec extends SparkSpec {

  private val goldens: Seq[(String, String, Int)] = Seq(
    ("bandung", "kemarin ke bandng naik kereta", 86),
    ("surabaya", "warga surabya senang", 88),
    ("tangerang selatan", "tangerang seltan macet", 94),
    ("yogyakarta", "yogyakata indah", 90),
    ("makassar", "makasar panas", 88),
    ("bandung", "menujubandungsekarang", 100),
    ("jakarta", "jakarta", 100),
    ("jakarta", "xjakartax", 100),
    ("abc", "", 0),
    // fuzzywuzzy's check_for_equivalence fires BEFORE check_empty_string,
    // so two equal strings — even two empty ones — score 100 (the bare
    // difflib-algorithm value would be 0; the decorators are part of the
    // executed reference)
    ("", "", 100),
    ("a", "b", 0),
    ("kitten", "sitting", 67),
    ("aaaa", "aaaaaaaaaaaaaaaaaaaa", 100),
    ("abab", "babababab", 100),
    ("café au lait", "cafe au lait enak", 92),
    ("ab" * 40, "ba" * 40, 99),
    ("x" * 250, "x" * 250 + "y", 100),
    ("abc" + "x" * 250, "x" * 250 + "abc", 2),
    ("semarang", "s e m a r a n g kota", 50),
    ("bali", "liburan ke bali", 100),
    ("baeddcbbgaabddadgd ea", "gfecdfbbgbffea bgbefdbadebdbge fcffdebcdc gedfadafgebdfd g cecdeggfdc babccgbgg ea", 48),
    ("befbegc aecbedcfcaf ab", "edadbb bcc cegddegf  bddbfaddabadbafbde dc d gdbbgfgg abagfbddd cgce db baabdcg  dgacgage eg cdedaafaa cabcbbdgbdabgfedfdegce fba bbdecfbdfec eaebcebbceedfde eabgeaafcec gabbcafcgcaefafd", 55),
    ("dbfgcdccgacfgdecbga dd", "feddadgfebefgfabeceabgffgbgdeagadfgbffbeegfgecdggcegaeedgf   d cbefbdeddcaad b gdg gdcabgdc adb c f g c  ede de bedeffbccdgcdbggf gadggag afeggd deg agfgc cagabgc caegfd ffgegeb aafdbaaddacdc bd efcbcebaeggdbdbebafgfbfag bgf cgce  gefdb", 9),
    (" d gfa fc", "dfefeeadbdg d   abedgdef fgff eeedbdfbcdd eebdedfceaceaaec bae   fcae bbg baccebdbgdg  egeabddebcdcbcag  eadee bdedgbdcecbacee b ege  bagfeabdaeac  ecg b fgffbcfg ega bfefbga gadf  adece  badceagbdb bc eeg  d cgdcbegfeaee c  ffg fddgdgaf ggc acfb b a", 33),
    ("cgcb efgbfgf abdedbgbb c", "aafaeffgcdgcccbgd cd e ea ecb fege edg bdgfeeageaa edfddecbae afcbefgcdcfece efb bcdgfbgaeb fegfbd afdb egbcaae bbdcg fgcgb geafd  dfbffagedb bdaafdcdbddd", 46),
    ("caeccecbaca", "dfaceacgbb  fb dae aa ggb  bbfcbcefge gbbdg dgf ggbfgfefc bbbbgbfcafbgfgaeefbdc dbffbedgaeaceeffaccgbcabdgg fcfefbaccabe g  gedbfgbe eadgaadedceefba gccgdfbgaga bfgggebgafc fbgbdggbgef", 55),
    ("fcbbdffc", "bcedccbc   ffc b  eeafbe  aafebbg a df ca bfbcad  cffeggfafbfbgeecfbcfegcbegfcbgfafecdf ddccbebafcgcccc agfd e dde df  eg", 62),
    ("gcdcea fbbebce cg", "d fagagfdgbfdafbfccae c  abaedcgbedebadg bb adc", 53),
    ("gafdgcbfba", " agfeafbfdbfcaffc  ccb aedadafeg eadefafebfgg gfc  febgbgcefbbfee gc f afgeabgfcac acbdffgac ff bcfgfedbac gbee de dbcb c bffbeeccfdbdcd aff cbbeg ggbcfb  fcccgabceccfdfebedecebcccfaabaedga ee dge bac", 40),
    ("g  dfcfffgcfbfd", "be dcbaeggdcffdc   e abg ddfaae  eabgcefgfagadfebg ebcbgfffcdgaaacf  ccffcgef e affbgea eda cgcdabda fgcgdg acdf gfc ffe ddeedeed f feebggfceaebf e ddeecbddaddabgf bcacg  defeabdacgcag ceaaebfe  c edbfc ecafedcggfbgbcc fdaegd efeaefdab ecg", 27),
    ("ebefddc c fg ddb fbbad", "ccf bd b a cg a eageadbagfbab aegccgfg ggbcfbcgcdaae ggdd fcedbagaddbba adag ddacedffdecdgeeacg afgfggcegc ddec aggcgdedfb fbdaegabdd dfeaddb ddgdfeg feef  b fdffgadcaegecdfdgd fe   cfcc caabaagcdbcad fa  aagaaeeagcbbcddefegbfg ddebabggg aacb gfbadd eabeacfadcgbecdgfgcbfabgdbfgfae  dfggcgbedbb", 27),
    ("cgcgffbba", " febcbcg gbabfbfgaeggbdcgcceee cbcgege bfed d bceagfgf fgcefd fcgfe dfgegfbdca d ebg cedecggb  ggafbbdfcagfgbabedd fg cfa begbbcfef d f b  fbeabafbcdccfg dgcc", 56),
    ("ggad ggaddebbcffd be ", "fggbff cebcfbdebcfcggcggc cc eccf afa cdg g g  cbadeaedec  bbefa dgbdea efb bddfgccddafecfeeebcgaeccdcfdg cegg bbgef  fab fbgdgd efefc faab abc  agdcecebfebfcagedgbbad bcd aafbgc bdgbbbffecgccbac fdcg dbbcbgfgfcdebdeaeddgead gbd baffcggfc babaedaagegggbcebebdcfgbegdadbgb", 29),
    ("aecbacac fecfce", "afgebeb  fa cfcebbdaaada fgccagdfdgfebfbacdagb eefb afdeed f ", 53),
    ("ddcagadfafagebddg acebadg", " bbcgbagcdeefgff edbdcbcbc  fgbfd e ebbceadfcbdfgaeecag db bcbaadcdgfbebabd cbfba acgg aggcfdcee cade g abegcgddagf  ffgecafdaea fdcbddeadgfccdffafcd ec abadda afdcfcfaaccbfbfgbfefccg fcfdcge", 52),
    ("eccagacfdb cfbdffcbf aed", "bfebaag gcg gfgb dc baeafebbfcgcbbf agcgcabfddgeeedbag cafagbe dbadceb beg  ebgcfgfc ae  edeacbbfgdagg d ebgacb ccddcagbgdcefbbg", 50),
    ("gfe agbgccbbbefgeg", " acegcgagfda efafeee bdce fegbd dg facbegcacddada afdef gbadf  c ffcebeagacddddegaa ccadeeeggf ed egbafeeb bfefeeedcdagfca eegggadfd fecceb cecfbdfdegffee b ab dbgegaccdfg cfcb fcfaa edcc bcgggg gaadfafdaaddfecbgecbaee fgcf fdcgaddcdacbfageaabaabg g", 33),
    ("e cd", "egbec", 57),
    ("bbebb ddedfgec", " d fdaabb cbbbed ee a", 52),
    ("caef", "gbbaaccff ebffcbgg eg gcbcacbg  cgfac  bg abefadfbgd fgcaac  cb fdfeadggdb   b  fb abggaabed ffad f f bbdaffefbac cgbeddbgd dfbgab  c aag cccbgfggdegfe ccgefddde", 75))

  test("partialRatio matches CPython difflib semantics on every golden") {
    val diffs = goldens.flatMap { case (a, b, want) =>
      val got = DifflibRatio.partialRatio(a, b)
      if (got == want) None else Some(s"('$a', '$b'): got $got want $want")
    }
    assert(diffs.isEmpty, s"${diffs.size}/${goldens.size} diverge:\n${diffs.mkString("\n")}")
    // symmetry holds for unequal lengths (shorter/longer normalization);
    // for EQUAL lengths the argument order decides which string gets
    // autojunk'd — CPython itself scores the 253-char autojunk pair 2 one
    // way and 1 the other, and the engine reproduces both directions
    goldens.filter { case (a, b, _) => a.length != b.length }.foreach {
      case (a, b, want) => assert(DifflibRatio.partialRatio(b, a) == want)
    }
    assert(DifflibRatio.partialRatio("x" * 250 + "abc", "abc" + "x" * 250) == 1)
  }

  test("150-pair adversarial battery matches CPython (asymmetry, autojunk, astral plane)") {
    // generated from CPython 3.11 difflib with the fuzzywuzzy decorator
    // semantics, tab-separated (a, b, expected): 5 regimes — equal-length
    // pairs (the asymmetric argument-order case), 200-400-char b strings
    // (autojunk active), unicode incl. astral-plane code points (🎈 is two
    // UTF-16 units but ONE difflib element), containment, generic random
    val in = getClass.getResourceAsStream("/difflib_partial_ratio_goldens.tsv")
    assert(in != null, "golden resource missing")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    assert(lines.size == 150)
    val diffs = lines.zipWithIndex.flatMap { case (line, i) =>
      val Array(a, b, want) = line.split("\t", -1)
      val got = DifflibRatio.partialRatio(a, b)
      if (got == want.toInt) None else Some(s"line ${i + 1}: got $got want $want")
    }
    assert(diffs.isEmpty, s"${diffs.size}/150 diverge:\n${diffs.mkString("\n")}")
  }

  test("partial_ratio_fw SQL surface agrees with the driver-side engine") {
    import spark.implicits._
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val df = goldens.map { case (a, b, want) => (a, b, want) }.toDF("a", "b", "want")
    df.createOrReplaceTempView("fw_t")
    val bad = spark.sql("SELECT a, b, want, partial_ratio_fw(a, b) AS got FROM fw_t")
      .filter($"got" =!= $"want").count()
    assert(bad == 0)
  }

  test("fuzzywuzzy-parity scorer reproduces ALL reference selection goldens") {
    import spark.implicits._
    // the FuzzyGoldens cases hold for the levenshtein scorer by
    // measurement; for the difflib scorer they must hold by CONSTRUCTION —
    // same algorithm as the pinned truth harness, including the
    // reference's max over both argument orders (utils.py:468-470)
    val dict = DictionaryLocator.Indonesian
    val df = FuzzyGoldens.cases.zipWithIndex.map { case ((t, a, _), i) =>
      (i.toLong, if (a == null) t else t + " " + a.toLowerCase)
    }.toDF("id", "text")
    val got = FuzzyLocator.detectPartialRatio(df, $"id", $"text", dict,
        fuzzywuzzyScores = true)
      .select($"id", $"province", $"city")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val diffs = FuzzyGoldens.cases.zipWithIndex.flatMap { case ((t, a, want), i) =>
      val g = got.getOrElse(i.toLong, (null, null))
      if (g == want) None
      else Some(s"'$t'${Option(a).fold("")(" | " + _)}: got $g want $want")
    }
    assert(diffs.isEmpty,
      s"${diffs.size}/${FuzzyGoldens.cases.size} diverge:\n${diffs.mkString("\n")}")
  }
}

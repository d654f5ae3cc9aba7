# Ground-truth harness for E2: executes the reference's
# detect_location_fuzzy (extracted by name from utils.py source, since
# utils.py's module imports need pymongo) with the compact test dictionary
# injected and a faithful stdlib implementation of fuzzywuzzy's
# partial_ratio (the library is not installable offline; its published
# algorithm is a thin wrapper over difflib.SequenceMatcher: align the
# shorter string against each matching-block window of the longer, return
# the best SequenceMatcher.ratio as an int percentage).
#
# The extracted source is PINNED by sha256: the goldens in
# FuzzyPartialRatioSpec
# were recorded against exactly this function body. If the reference
# checkout changes, the hash check below fails loudly instead of silently
# exec()ing mutated untrusted code.
import ast
import hashlib
import sys
import types
from difflib import SequenceMatcher

PINNED_SHA256 = "4e105a6dfbbb416ef08d31e05e24943723297ccb86e968913fa5f5c3a3bcb4c0"

src = open('/root/reference/utils.py').read()
tree = ast.parse(src)
fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
          and n.name == 'detect_location_fuzzy')
code = ast.get_source_segment(src, fn)
digest = hashlib.sha256(code.encode()).hexdigest()
if digest != PINNED_SHA256:
    sys.exit(f"REFUSING to exec: detect_location_fuzzy changed since the "
             f"goldens were recorded (sha256 {digest} != {PINNED_SHA256}). "
             f"Re-audit the function, re-record the goldens, then re-pin.")


def partial_ratio(s1, s2):
    """fuzzywuzzy's partial_ratio (fuzz.py), re-expressed over stdlib
    difflib: best SequenceMatcher ratio of the shorter string against
    len(shorter)-sized windows of the longer, anchored at each matching
    block. fuzzywuzzy wraps every scorer in @check_for_none
    @check_for_equivalence @check_empty_string — in that order, so two
    EQUAL strings (including two empty ones) short-circuit to 100 before
    the empty-string -> 0 rule."""
    if s1 is None or s2 is None:
        raise TypeError
    if s1 == s2:
        return 100
    if len(s1) <= len(s2):
        shorter, longer = s1, s2
    else:
        shorter, longer = s2, s1
    if len(shorter) == 0:
        return 0
    m = SequenceMatcher(None, shorter, longer)
    scores = []
    for block in m.get_matching_blocks():
        long_start = max(block[1] - block[0], 0)
        long_end = long_start + len(shorter)
        long_substr = longer[long_start:long_end]
        m2 = SequenceMatcher(None, shorter, long_substr)
        r = m2.ratio()
        if r > .995:
            return 100
        scores.append(r)
    return int(round(100 * max(scores)))


# `detect_location_fuzzy` does `from fuzzywuzzy import fuzz` inside its own
# body; satisfy it with the stdlib implementation above.
fuzz_mod = types.ModuleType("fuzzywuzzy.fuzz")
fuzz_mod.partial_ratio = partial_ratio
pkg = types.ModuleType("fuzzywuzzy")
pkg.fuzz = fuzz_mod
sys.modules["fuzzywuzzy"] = pkg
sys.modules["fuzzywuzzy.fuzz"] = fuzz_mod

COMPACT = {
    "DKI Jakarta": ["Jakarta Pusat", "Jakarta Utara", "Jakarta Barat",
                    "Jakarta Selatan", "Jakarta Timur", "Jakarta"],
    "Jawa Barat": ["Bandung", "Bekasi", "Bogor", "Depok", "Cimahi", "Sukabumi"],
    "Jawa Tengah": ["Semarang", "Solo", "Surakarta", "Magelang", "Pekalongan"],
    "DI Yogyakarta": ["Yogyakarta", "Jogja", "Sleman", "Bantul"],
    "Jawa Timur": ["Surabaya", "Malang", "Kediri", "Madiun", "Batu"],
    "Banten": ["Tangerang", "Serang", "Cilegon", "Tangerang Selatan"],
    "Sumatera Utara": ["Medan", "Binjai", "Pematangsiantar"],
    "Sumatera Barat": ["Padang", "Bukittinggi", "Payakumbuh"],
    "Sulawesi Selatan": ["Makassar", "Parepare", "Palopo"],
    "Bali": ["Denpasar"],
}
ns = {"load_indonesian_locations": lambda: COMPACT}
exec(code, ns)
detect = ns["detect_location_fuzzy"]

cases = [
    # typos at edit distance 1-2 from dictionary names
    "kemarin ke bandng naik kereta", "warga surabya senang",
    "tangerang seltan macet", "yogyakata indah", "makasar panas",
    "smarang kota lama", "di bandungg", "ke sukabmi",
    # exact hits (partial_ratio 100)
    "makan di jakarta pusat", "liburan ke bali", "bandung banten",
    "jakarta", "tangerang selatan",
    # substring-inside-token alignments (partial_ratio's specialty — a
    # token join cannot see these)
    "menujubandungsekarang", "kotasurabayaindah", "xjakartax",
    # province-only matches
    "jawa barat", "sumatera utara juara", "sulawesi",
    # nothing
    "tidak ada kota dalam teks ini ya", "xyzzy qwerty", "",
    # short texts (text shorter than the city name: the swapped window)
    "band", "sura", "jak",
    # author_name concatenation
    ("makan enak", "Budi Bandung"),
    ("hari baik", "warga_medan"),
]
for case in cases:
    if isinstance(case, tuple):
        r = detect(case[0], author_name=case[1])
        print(repr(case), "->", (r["province"], r["city"]))
    else:
        r = detect(case)
        print(repr(case), "->", (r["province"], r["city"]))

# Ground-truth harness: executes the reference's detect_location_from_text
# (extracted by name from utils.py source, since utils.py's module imports
# need pymongo) with the compact test dictionary injected.
#
# The extracted source is PINNED by sha256: the goldens in
# DictionaryLocatorSpec were recorded against exactly this function body.
# If the reference checkout changes, the hash check below fails loudly
# instead of silently exec()ing mutated untrusted code.
import re, ast, hashlib, sys

PINNED_SHA256 = "9477287a6bc22e47c73f23c7bc3b3239f9f5ba86301e690a86d1c53423d5b860"

src = open('/root/reference/utils.py').read()
tree = ast.parse(src)
fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
          and n.name == 'detect_location_from_text')
code = ast.get_source_segment(src, fn)
digest = hashlib.sha256(code.encode()).hexdigest()
if digest != PINNED_SHA256:
    sys.exit(f"REFUSING to exec: detect_location_from_text changed since the "
             f"goldens were recorded (sha256 {digest} != {PINNED_SHA256}). "
             f"Re-audit the function, re-record the goldens, then re-pin.")

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
ns = {"re": re, "load_indonesian_locations": lambda: COMPACT}
exec(code, ns)
detect = ns["detect_location_from_text"]

cases = [
    "jakarta", "jakarta selatan", "warga jakarta pusat senang",
    "selatan", "tangerang", "tangerang selatan", "di selatan kota",
    "visiting bandung today", "bandung-bogor", "jalan_jogja|besok",
    "jaksel", "sby", "jawa barat", "sumatera", "sumatera utara",
    "diyogyakarta", "yogyakarta", "nusa tenggara", "dki jakarta",
    "jawabarat", "provinsi bali", "bali", "no location here",
    "Depok.Sleman", "magelang; surakarta", "utara", "barat",
    "MAKAN DI MEDAN", "timur jakarta", "pusat kota",
]
for t in cases:
    r = detect(t)
    print(repr(t), "->", (r["province"], r["city"]))
r = detect("makan enak", author_name="Budi Bandung")
print("author case ->", (r["province"], r["city"]))

# Ground-truth harness: executes the reference's detect_location_from_text
# (extracted by name from utils.py source, since utils.py's module imports
# need pymongo) with the compact test dictionary injected.
import re, ast

src = open('/root/reference/utils.py').read()
tree = ast.parse(src)
fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
          and n.name == 'detect_location_from_text')
code = ast.get_source_segment(src, fn)

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

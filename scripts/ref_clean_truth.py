# Golden input->output pairs from the reference's two cleaning functions
# (utils.py clean_tweet_text; src/resilient_scraper.py clean_text).
#
# Extracted sources are PINNED by sha256 (hash of the body BEFORE the
# self-stripping rewrite): a mutated reference checkout fails loudly
# instead of being exec()'d silently.
import re, ast, hashlib, sys

PINNED = {
    "clean_tweet_text": "b8cb8beb29945f9fe14f2a25f1f4a47e63debeceab68dd750aef485480bbe267",
    "clean_text": "59e87e6ef0b9c724f5ef88993c947108be7e4f4fc02c1a432b5fb08b6b360786",
}

def extract(path, name):
    src = open(path).read()
    tree = ast.parse(src)
    for n in ast.walk(tree):
        if isinstance(n, ast.FunctionDef) and n.name == name:
            ns = {"re": re}
            code = ast.get_source_segment(src, n)
            digest = hashlib.sha256(code.encode()).hexdigest()
            if digest != PINNED[name]:
                sys.exit(f"REFUSING to exec: {name} changed since goldens were "
                         f"recorded (sha256 {digest} != {PINNED[name]}).")
            # scraper clean_text is a method; strip 'self' if present
            code = code.replace("def %s(self," % name, "def %s(" % name)
            exec(compile(ast.parse(code), path, 'exec'), ns)
            return ns[name]
    raise KeyError(name)

f1 = extract('/root/reference/utils.py', 'clean_tweet_text')
f2 = extract('/root/reference/src/resilient_scraper.py', 'clean_text')

cases = [
    "Check https://x.com/a/status/1 and http://t.co/xyz now",
    "Halo @user1 dan @user_2! #MBG #makan_gratis",
    "  spaces\t\tand\nnewlines  ",
    "UPPER Case MiXeD",
    "www.example.com plain",
    "#tag1#tag2 @a@b",
    "",
    "no noise at all",
    "akhir url https://t.co/abc",
]
for t in cases:
    print(repr(t))
    print("  F1:", repr(f1(t)))
    print("  F2:", repr(f2(t)))

# Golden-vector generator for graft.similarity.Fuzz tests (tooling only,
# not shipped). ratio = normalized indel via an independent O(nm) LCS DP;
# jaro_winkler cross-checked against DuckDB's implementation.
import random, duckdb, csv

def lcs(a, b):
    m, n = len(a), len(b)
    dp = [0]*(n+1)
    for i in range(1, m+1):
        prev = 0
        for j in range(1, n+1):
            cur = dp[j]
            dp[j] = prev+1 if a[i-1] == b[j-1] else max(dp[j], dp[j-1])
            prev = cur
    return dp[n]

def ratio(a, b):
    t = len(a)+len(b)
    if t == 0: return 100.0
    d = t - 2*lcs(a, b)
    return 100.0*(1.0 - d/t)

def token_set(a, b):
    ta, tb = set(a.split()), set(b.split())
    sect, dab, dba = ta & tb, ta - tb, tb - ta
    if sect and (not dab or not dba): return 100.0
    abj, baj = " ".join(sorted(dab)), " ".join(sorted(dba))
    sect_len = len(" ".join(sorted(sect)))
    sep = 1 if sect_len else 0
    sab = sect_len + ((sep + len(abj)) if abj else 0)
    sba = sect_len + ((sep + len(baj)) if baj else 0)
    dist = len(abj)+len(baj)-2*lcs(abj, baj)
    denom = sab + sba
    best = 100.0 if denom == 0 else 100.0*(1.0 - dist/denom)
    if sect_len:
        best = max(best,
                   100.0*(1.0 - (sab-sect_len)/(sect_len+sab)),
                   100.0*(1.0 - (sba-sect_len)/(sect_len+sba)))
    return best

def token_sort(a, b):
    return ratio(" ".join(sorted(a.split())), " ".join(sorted(b.split())))

con = duckdb.connect()
def jw(a, b):
    return con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]

random.seed(42)
vocab = ["mahalle","cadde","sokak","no","daire","kat","örnek","atatürk",
         "istanbul","izmir","fethiye","muğla","apartman","12","3","864",
         "spark","join","merge","scan","the","a"]
pairs = [
    ("this is a test", "this is a test!"),
    ("hello", "world"),
    ("fuzzy was a bear", "fuzzy fuzzy was a bear"),
    ("mariners vs angels", "los angeles angels of anaheim at seattle mariners"),
    ("", ""), ("", "abc"), ("abc", ""),
    ("a b c", "c b a"),
    ("örnek mahalle atatürk cadde no 12", "atatürk cad no 12 örnek mah"),
]
for _ in range(60):
    a = " ".join(random.choices(vocab, k=random.randint(1, 12)))
    b = " ".join(random.choices(vocab, k=random.randint(1, 12)))
    pairs.append((a, b))
for _ in range(40):  # char-level noise pairs
    a = "".join(random.choices("abçdğeıfgİhiIjksşoöuüz /.,:123", k=random.randint(0, 40)))
    b = "".join(random.choices("abçdğeıfgİhiIjksşoöuüz /.,:123", k=random.randint(0, 40)))
    pairs.append((a, b))

with open("src/test/resources/fuzz_golden.tsv", "w", newline="") as f:
    w = csv.writer(f, delimiter="\t")
    w.writerow(["a","b","ratio","token_set","token_sort","jw"])
    for a, b in pairs:
        w.writerow([a, b, repr(ratio(a,b)), repr(token_set(a,b)),
                    repr(token_sort(a,b)), repr(jw(a,b))])
print("wrote", len(pairs), "vectors")

# Golden generator: runs the REFERENCE's own normalize_and_parse +
# postprocess (pure stdlib) on synthetic Turkish addresses to capture its
# exact behavior as test vectors (studying behavior; no code copied).
import sys, json, random
sys.path.insert(0, "/root/reference")
from addresskit.preprocessing.normalize_and_parse import normalize_and_parse, clean_text
from addresskit.preprocessing.postprocess import postprocess_parts

random.seed(42)
mah = ["Örnek", "Yıldız", "Cumhuriyet", "GÜLBAHAR", "Kavaklı", "İnönü", "Barbaros"]
cad = ["Atatürk", "İstiklal", "Bağdat", "Ziya Gökalp", "Fevzi Çakmak"]
forms = [
    "{m} mah. {c} cad. no:{n}/{d} daire:{d2} kat:{k} {dist}/{city}",
    "{m} MAHALLESİ {c} CADDESİ NO {n} D.{d2} K:{k} {city}",
    "{m} mh {c} cd no{n} d {d2} kat {k} {dist} {city}",
    "{m} mahalle {sn}.sokak no: {n} {city}",
    "{sn} sokak {m} mah. no:{n}/{d} {dist}/{city}",
    "{m} mah {c} bulv. {b} apt. kat {k} daire {d2} {city}",
    "{c} caddesi {m} sokak no {n} {b} plaza {dist} {city}",
    "{m} mevkii {sn} sokak no {n} {city}",
]
cities = [("İstanbul","Kadıköy"),("İzmir","Bornova"),("Muğla","Fethiye"),
          ("Ankara","Çankaya"),("Bursa","Nilüfer"),("Antalya","Muratpaşa")]
rows = []
seeds = ["Örnek mah. Atatürk cad. no:12/3 daire:5 Şişli/İstanbul",
         "küçük çamlıca mahallesi, üsküdar İSTANBUL no:7 kat:2",
         "864.sokak no 15 d 3 konak/izmir",
         "2001 sokak no:4 kat:1 bodrum/muğla",
         "fener kalamış caddesi no 8/2 marina apartmanı kadıköy"]
for s in seeds:
    rows.append(s)
for i in range(80):
    f = random.choice(forms)
    city, dist = random.choice(cities)
    rows.append(f.format(
        m=random.choice(mah), c=random.choice(cad), n=random.randint(1, 99),
        d=random.randint(1, 9), d2=random.randint(1, 9), k=random.randint(1, 6),
        sn=random.randint(100, 2100), b=random.choice(["Yasemin","Deniz","Palmiye"]),
        dist=dist, city=city))

out = []
for raw in rows:
    normalized, parts = normalize_and_parse(raw)
    post = postprocess_parts(normalized, dict(parts))
    out.append({"raw": raw, "clean": clean_text(raw), "normalized": normalized,
                "parts": parts, "post": post})
with open("src/test/resources/parse_golden.json", "w", encoding="utf-8") as f:
    json.dump(out, f, ensure_ascii=False)
print("wrote", len(out), "golden rows")
print(json.dumps(out[0], ensure_ascii=False))

"""Language-ID accuracy on held-out labeled text (none of these sentences
appear in the LATIN_SEEDS training corpus) plus Spark/DuckDB twin parity.
The model is deterministic, so the fixture accuracy is pinned exactly."""

import duckdb
import pytest

from relationaldecomposition_spark.operators import text as T

# held-out sentences per language — three independent authored sets
LABELED = {
    "en": ["the old man reads a book by the window every evening before dinner",
           "my sister wants to travel around the world when she finishes school",
           "it was raining all day so we stayed at home and watched a film"],
    "de": ["der alte mann liest jeden abend vor dem essen ein buch am fenster",
           "meine schwester möchte um die welt reisen wenn sie mit der schule fertig ist",
           "es hat den ganzen tag geregnet also sind wir zu hause geblieben"],
    "fr": ["le vieil homme lit un livre près de la fenêtre chaque soir avant le dîner",
           "ma sœur veut voyager autour du monde quand elle aura fini l'école",
           "il a plu toute la journée alors nous sommes restés à la maison"],
    "es": ["el viejo hombre lee un libro junto a la ventana cada noche antes de cenar",
           "mi hermana quiere viajar por el mundo cuando termine la escuela",
           "estuvo lloviendo todo el día así que nos quedamos en casa"],
    "pt": ["o velho homem lê um livro perto da janela todas as noites antes do jantar",
           "minha irmã quer viajar pelo mundo quando terminar a escola",
           "choveu o dia inteiro então ficamos em casa assistindo um filme"],
    "it": ["il vecchio uomo legge un libro vicino alla finestra ogni sera prima di cena",
           "mia sorella vuole viaggiare per il mondo quando finirà la scuola",
           "ha piovuto tutto il giorno quindi siamo rimasti a casa a guardare un film"],
    "nl": ["de oude man leest elke avond voor het eten een boek bij het raam",
           "mijn zus wil de wereld rondreizen als ze klaar is met school",
           "het regende de hele dag dus bleven we thuis een film kijken"],
    "sv": ["den gamle mannen läser en bok vid fönstret varje kväll före middagen",
           "min syster vill resa runt i världen när hon är klar med skolan",
           "det regnade hela dagen så vi stannade hemma och tittade på en film"],
    "da": ["den gamle mand læser en bog ved vinduet hver aften før aftensmaden",
           "min søster vil rejse rundt i verden når hun er færdig med skolen",
           "det regnede hele dagen så vi blev hjemme og så en film"],
    "pl": ["stary człowiek czyta książkę przy oknie każdego wieczoru przed kolacją",
           "moja siostra chce podróżować po świecie kiedy skończy szkołę",
           "padało cały dzień więc zostaliśmy w domu i oglądaliśmy film"],
    "cs": ["starý muž čte každý večer před večeří knihu u okna",
           "moje sestra chce cestovat po světě až dokončí školu",
           "celý den pršelo takže jsme zůstali doma a dívali se na film"],
    "tr": ["yaşlı adam her akşam yemekten önce pencerenin yanında kitap okur",
           "kız kardeşim okulu bitirince dünyayı gezmek istiyor",
           "bütün gün yağmur yağdı bu yüzden evde kalıp film izledik"],
    "ro": ["bătrânul citește o carte lângă fereastră în fiecare seară înainte de cină",
           "sora mea vrea să călătorească în jurul lumii când termină școala",
           "a plouat toată ziua așa că am rămas acasă și ne-am uitat la un film"],
    "fi": ["vanha mies lukee kirjaa ikkunan ääressä joka ilta ennen illallista",
           "siskoni haluaa matkustaa ympäri maailmaa kun hän saa koulun valmiiksi",
           "satoi koko päivän joten jäimme kotiin katsomaan elokuvaa"],
    "hu": ["az öreg ember minden este vacsora előtt könyvet olvas az ablaknál",
           "a húgom világ körüli útra akar menni amikor befejezi az iskolát",
           "egész nap esett az eső ezért otthon maradtunk és filmet néztünk"],
    "id": ["orang tua itu membaca buku di dekat jendela setiap malam sebelum makan",
           "saudara perempuan saya ingin berkeliling dunia setelah selesai sekolah",
           "hujan turun sepanjang hari jadi kami tinggal di rumah menonton film"],
    # non-Latin scripts
    "ru": ["дети играют в саду а мама на кухне готовит еду"],
    "el": ["τα παιδιά παίζουν στον κήπο και η μητέρα είναι στην κουζίνα"],
    "ar": ["الأطفال يلعبون في الحديقة والأم في المطبخ"],
    "he": ["הילדים משחקים בגן והאם במטבח"],
    "hi": ["बच्चे बगीचे में खेलते हैं और माँ रसोई में है"],
    "th": ["เด็กๆเล่นในสวนและแม่อยู่ในครัว"],
    "ko": ["아이들이 정원에서 놀고 엄마는 부엌에 있다"],
    "ja": ["子供たちは庭で遊んでいて、母は台所にいます"],
    "zh": ["孩子们在花园里玩，妈妈在厨房里做饭"],
}


@pytest.fixture(scope="module")
def labeled_rows():
    rows, i = [], 0
    for lang, sents in LABELED.items():
        for s in sents:
            rows.append((i, lang, s))
            i += 1
    return rows


def test_heldout_accuracy_spark(spark, labeled_rows):
    df = spark.createDataFrame(labeled_rows, ["doc_id", "lang", "text"])
    pred = {r["doc_id"]: r["pred_lang"]
            for r in T.lang_id(df, "text", "doc_id").collect()}
    misses = [(lang, s, pred[i]) for i, lang, s in labeled_rows
              if pred[i] != lang]
    # deterministic model + pinned fixture: exact accuracy, no flake margin
    assert not misses, misses


def test_spark_duckdb_twin_parity(spark, labeled_rows):
    df = spark.createDataFrame(labeled_rows, ["doc_id", "lang", "text"])
    got_spark = {r["doc_id"]: r["pred_lang"]
                 for r in T.lang_id(df, "text", "doc_id").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", labeled_rows)
    got_sql = dict(con.execute(
        T.sql_lang_id("t", "text", "doc_id")).fetchall())
    assert got_spark == got_sql


def test_und_and_empty(spark):
    rows = [(1, "xyzzy plugh 12345 9999"), (2, ""), (3, "     "), (4, "42")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["pred_lang"]
           for r in T.lang_id(df, "text", "doc_id").collect()}
    assert out[2] == "und" and out[3] == "und" and out[4] == "und"


def test_script_beats_sprinkled_latin(spark):
    # mostly-Russian text with a Latin brand name must stay ru;
    # mostly-English text with one Cyrillic word must stay en
    rows = [(1, "дети играют в саду около дома iphone а мама готовит"),
            (2, "the children play in the garden near the house привет")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["pred_lang"]
           for r in T.lang_id(df, "text", "doc_id").collect()}
    assert out[1] == "ru" and out[2] == "en"


def test_python_scorer_matches_spark(spark, labeled_rows):
    """py_lang_score (the streaming face's Arrow scorer) must agree with
    the declarative batch path on every held-out sentence — same constants,
    same all-positions counting, same tie-breaks."""
    df = spark.createDataFrame(labeled_rows, ["doc_id", "lang", "text"])
    got_spark = {r["doc_id"]: r["pred_lang"]
                 for r in T.lang_id(df, "text", "doc_id").collect()}
    for i, _, s in labeled_rows:
        assert T.py_lang_score(s) == got_spark[i], (i, s)
    assert T.py_lang_score(None) == "und"
    assert T.py_lang_score("") == "und"


def test_np_kernel_matches_declarative(spark, labeled_rows):
    """lang_id(kernel=\"np\") — the vectorized Arrow scorer — must agree
    with the declarative oracle face EXACTLY on the held-out fixture AND
    the gate corpus (integer scoring from the same constants)."""
    from tests.conftest import load

    df = spark.createDataFrame(labeled_rows, ["doc_id", "lang", "text"])
    e = dict(T.lang_id(df, "text", "doc_id").collect())
    g = dict(T.lang_id(df, "text", "doc_id", kernel="np").collect())
    assert e == g

    docs = load(spark, "documents")
    e = dict(T.lang_id(docs, "text", "doc_id").collect())
    g = dict(T.lang_id(docs, "text", "doc_id", kernel="np").collect())
    assert e == g and len(e) == docs.count()


def test_np_scorer_matches_python_twin_edges():
    cases = ["", None, "   ", "こんにちは世界", "Привет мир", "שלום עולם",
             "नमस्ते दुनिया", "mixed ascii こんにちは text",
             "the quick brown fox jumps", "x \x00 y", "😀 emoji only 😀"]
    got = T.np_lang_pred(cases)
    for s, g in zip(cases, got):
        assert g == T.py_lang_score(s), (s, g)


# ---------------------------------------------------------------------------
# round-7: normalized-prefix truncation (max_chars) — the doc_profile LID
# cost lever. Accuracy must be UNCHANGED on the held-out fixture, the
# prefix semantics identical across all four faces, and truncation must
# demonstrably ignore content past the cut.
# ---------------------------------------------------------------------------

LID_N = 256


def test_truncated_accuracy_unchanged(labeled_rows):
    full = T.np_lang_pred([s for _, _, s in labeled_rows])
    trunc = T.np_lang_pred([s for _, _, s in labeled_rows],
                           max_chars=LID_N)
    assert full == trunc
    labels = [lang for _, lang, _ in labeled_rows]
    assert trunc == labels  # held-out accuracy: still exact


def test_truncated_faces_agree(spark, labeled_rows):
    """expr / np / python / DuckDB faces with the same max_chars produce
    identical predictions — including on texts LONGER than the cut whose
    tail would change the answer."""
    long_mix = ("the cat and the dog and the house " * 10          # ~340 en
                + " le chat et le chien et la maison " * 20)       # fr tail
    ru_tail = ("the quick brown fox jumps over the lazy dog " * 8  # ~360 en
               + " привет мир " * 40)                              # ru tail
    rows = list(labeled_rows) + [(9001, "mix", long_mix),
                                 (9002, "mix", ru_tail)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    e = dict(T.lang_id(df, "text", "doc_id", max_chars=LID_N).collect())
    g = dict(T.lang_id(df, "text", "doc_id", kernel="np",
                       max_chars=LID_N).collect())
    assert e == g
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    s = dict(con.execute(
        T.sql_lang_id("t", "text", "doc_id", max_chars=LID_N)).fetchall())
    assert e == s
    for i, _, txt in rows:
        assert T.py_lang_score(txt, max_chars=LID_N) == e[i], i
    # truncation is REAL: the full-text scorer sees the dominant tail,
    # the truncated one answers from the prefix
    assert T.np_lang_pred([long_mix, ru_tail]) != \
        T.np_lang_pred([long_mix, ru_tail], max_chars=LID_N)
    assert e[9001] == "en" and e[9002] == "en"

"""Deterministic test fixtures (FIXTURES.md A & B; SURVEY.md §5).

A. ``typed_test`` — the scalar-type/null coverage table mirroring the
   reference's SQLite-differential `test` table (mapd-core/Tests/
   ExecuteTest.cpp:4033-4073: 29 typed columns, 3 row templates ×
   g_num_rows).
B. ``mini_imdb`` — an IMDB-shaped star (dataset/schematext.sql ratios at
   ~1/1000 scale) with skewed fact FKs, for JOB-shaped join-order queries.
   Value pools are seeded with the literals the 113-query JOB corpus
   filters on (queries/*.sql.sq.cnt) so every family selects a non-trivial
   subset — join-order choice must matter (FIXTURES.md B).

Both are seeded and pure-Python/numpy generated; write_*(spark, dir)
materialize parquet so Spark and DuckDB read identical bytes (the
differential-oracle discipline of SURVEY.md §5). ``write_mini_imdb_arrow``
needs no SparkSession at all (pyarrow only), so the DuckDB oracle side can
materialize the fixture without a JVM.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
import threading
from decimal import Decimal

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ------------------------------------------------------------- A. typed_test

TYPED_TEST_SCHEMA = T.StructType(
    [
        T.StructField("x", T.IntegerType(), False),
        T.StructField("y", T.IntegerType()),
        T.StructField("z", T.ShortType()),
        T.StructField("t", T.LongType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("f", T.FloatType()),
        T.StructField("ff", T.FloatType()),
        T.StructField("fn", T.FloatType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("dn", T.DoubleType()),
        T.StructField("str", T.StringType()),
        T.StructField("null_str", T.StringType()),
        T.StructField("fixed_str", T.StringType()),
        T.StructField("real_str", T.StringType()),
        T.StructField("shared_dict", T.StringType()),
        T.StructField("m", T.TimestampNTZType()),
        T.StructField("n", T.IntegerType()),  # reference TIME: sec-since-midnight
        T.StructField("o", T.DateType()),
        T.StructField("fx", T.IntegerType()),
        T.StructField("dd", T.DecimalType(10, 2)),
        T.StructField("dd_notnull", T.DecimalType(10, 2), False),
        T.StructField("ss", T.StringType()),
        T.StructField("u", T.IntegerType()),
        T.StructField("ofd", T.IntegerType()),
        T.StructField("ufd", T.IntegerType(), False),
        T.StructField("ofq", T.LongType()),
        T.StructField("ufq", T.LongType(), False),
        T.StructField("arr_i32", T.ArrayType(T.IntegerType())),
    ]
)

_TS1 = dt.datetime(2014, 12, 13, 22, 23, 15)
_TS2 = dt.datetime(2014, 12, 14, 22, 23, 15)

# three row templates, like ExecuteTest.cpp's three INSERT groups
_TYPED_TEMPLATES = [
    (7, 42, 101, 1001, True, 1.1, 1.1, None, 2.2, None,
     "foo", None, "foo", "real_foo", "foo",
     _TS1, 54794, dt.date(1999, 9, 9), 9, Decimal("111.10"), Decimal("111.10"),
     "fish", None, 2147483647, -2147483648, None, -1,
     [1, 2, 3]),
    (8, 43, -78, 1002, False, 1.2, 101.2, -101.2, 2.4, -2002.4,
     "bar", None, "bar", "real_bar", None,
     _TS2, 54794, None, None, Decimal("222.20"), Decimal("222.20"),
     None, 2147483647, -2147483647, -2147483647, 9223372036854775807, -9223372036854775808,
     [2, 3, 4]),
    (7, 43, 102, 1002, True, 1.3, 1000.3, -1000.3, 2.6, -220.6,
     "baz", None, None, "real_baz", "baz",
     _TS1, 54794, dt.date(1999, 9, 9), 11, Decimal("333.30"), Decimal("333.30"),
     "boat", 1, -1, 1, 1, -1,
     None),
]


def typed_test_df(spark: SparkSession, num_rows: int = 30) -> DataFrame:
    rows = [_TYPED_TEMPLATES[i % 3] for i in range(num_rows)]
    return spark.createDataFrame(rows, TYPED_TEST_SCHEMA)


def write_typed_test(spark: SparkSession, out_dir: str, num_rows: int = 30) -> str:
    path = os.path.join(out_dir, "typed_test.parquet")
    typed_test_df(spark, num_rows).coalesce(1).write.mode("overwrite").parquet(path)
    return path


# -------------------------------------------------------------- B. mini_imdb

# bump when the generator changes: ensure_job_fixture() keys its on-disk
# cache by this so stale parquet from an older generator is never reused
FIXTURE_VERSION = 4

# (table, rows) at ~1/1000 IMDB scale (dataset/README.md counts); fact
# tables multiply by `scale`, dimension tables stay fixed
_IMDB_DIM_SIZES = {
    "company_type": 4,
    "comp_cast_type": 4,
    "info_type": 113,
    "kind_type": 7,
    "link_type": 18,
    "role_type": 12,
    "keyword": 130,
    "company_name": 235,
}
_IMDB_FACT_SIZES = {
    "title": 2500,
    "name": 4200,
    "char_name": 3100,
    "aka_name": 900,
    "aka_title": 360,
    "cast_info": 36000,
    "movie_info": 14800,
    "movie_info_idx": 1380,
    "movie_companies": 2600,
    "movie_keyword": 4500,
    "movie_link": 120,
    "complete_cast": 135,
    "person_info": 2760,
}

# info_type ids 1..17 carry the names the JOB corpus filters on
# (it.info = 'rating' / 'genres' / 'trivia' / ...); the rest are generic
_INFO_TYPES = [
    "rating", "genres", "top 250 rank", "bottom 10 rank", "votes",
    "release dates", "languages", "countries", "budget", "runtimes",
    "color info", "sound mix", "certificates", "mini biography",
    "birth notes", "height", "trivia",
] + [f"info_{i}" for i in range(96)]
_IT = {name: i + 1 for i, name in enumerate(_INFO_TYPES[:17])}

# the 18 public IMDB link types (JOB filters: 'features', 'follows',
# IN ('references','referenced in',...), LIKE '%follow%')
_LINK_TYPES = [
    "follows", "followed by", "remake of", "remade as", "references",
    "referenced in", "spoofs", "spoofed in", "features", "featured in",
    "spin off from", "spin off", "version of", "similar to", "edited into",
    "edited from", "alternate language version of", "sequel",
]

# every keyword the corpus filters on, then generic fillers; fact FKs are
# zipf-skewed toward low ids so the named keywords carry real row counts
_NAMED_KEYWORDS = [
    "character-name-in-title", "murder", "violence", "blood", "sequel",
    "superhero", "marvel-comics", "based-on-comic", "fight", "gore",
    "death", "female-nudity", "murder-in-title", "tv-special", "second-part",
    "hero", "martial-arts", "hand-to-hand-combat", "nerd", "loner",
    "alienation", "dignity", "computer-animation", "computer-animated-movie",
    "marvel-cinematic-universe", "10,000-mile-club", "based-on-novel",
    "revenge", "magnet", "web", "claw", "laser", "hospital",
]

_GENRES = ["Drama", "Comedy", "Action", "Thriller", "Horror", "Documentary",
           "Sci-Fi", "Crime", "War", "Western", "Family", "Romance",
           "Adventure", "Musical"]
_COUNTRIES = ["USA", "Germany", "Sweden", "Norway", "Denmark", "Bulgaria",
              "Japan", "France", "UK", "America", "Poland", "Italy"]
_LANGUAGES = ["German", "Swedish", "Norwegian", "Danish", "Denish", "English",
              "American", "Japanese", "Polish", "French"]

_TITLE_WORDS = ["Champion", "Loser", "Money", "Murder", "murder",
                "Kung Fu Panda", "One Piece", "Dragon Ball Z", "Vampire",
                "Birdemic", "Freddy", "Jason", "Saw", "Mord", "Iron Man",
                "Movie Night", "Glory"]

_CHAR_NAMES = ["Tony Stark", "Iron Man", "Queen", "Sherlock Holmes",
               "Spider-Man", "Batman", "Superman", "Wonder Woman",
               "Man in Black", "Old Man", "Gunman", "Chairman"]

_PERSON_NAMES = ["Downey Robert Jr.", "Angela Bertson", "Albert Young",
                 "Bert Anderson", "Tim Xu", "Timothy Zhang", "Yolanda Quinn",
                 "Yuri Zhivago", "Xavier Oro", "Zach Bertrand", "Anna Angel",
                 "Brian Yu", "Angel Ybarra"]

_COMPANY_NAMES = ["Warner Bros.", "Warner Home Video", "20th Century Fox",
                  "Twentieth Century Fox Film Corporation", "Lionsgate",
                  "Lionsgate Films", "DreamWorks Animation", "YouTube",
                  "Universal Film Co.", "Best Film", "Polski Film",
                  "Channel 4 Film", "Mosfilm Film Studio", "San Marino Films",
                  "Cinecitta Film"]
# reserved company ids 1..15 get these country codes (corpus filters on
# [us]/[de]/[jp]/[nl]/[pl]/[gb]/[ru]/[sm]/[it])
_CO_CODES = ["[us]", "[us]", "[us]", "[us]", "[us]", "[de]",
             "[us]", "[us]", "[jp]", "[nl]", "[pl]", "[gb]",
             "[ru]", "[sm]", "[it]"]

_CI_NOTES = ["(voice)", "(voice: English version)", "(voice: Japanese version)",
             "(voice) (uncredited)", "(producer)", "(executive producer)",
             "(writer)", "(head writer)", "(written by)", "(story)",
             "(story editor)", "(uncredited)", None]
_CI_NOTE_P = [0.06, 0.02, 0.02, 0.02, 0.05, 0.04,
              0.05, 0.02, 0.03, 0.03, 0.03, 0.06, 0.57]

_MC_ROLE = ["(presents)", "(co-production)", "(in association with)",
            "(as Metro-Goldwyn-Mayer Pictures)"]
_MC_REGION = ["(USA)", "(France)", "(Japan)", "(Germany)", "(worldwide)"]
_MC_MEDIA = ["(TV)", "(VHS)", "(Blu-ray)", "(DVD)", "(theatrical)", "(video)"]

_MONTHS = ["January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December"]


def _skewed_fk(rng: np.random.Generator, n_rows: int, n_parents: int) -> np.ndarray:
    """Zipf-flavored FK: a few 'blockbuster' parents own an outsized share —
    join-order choice must matter (FIXTURES.md B). Exponent 1.05 puts ~5%
    of children on the hottest parent (vs 32% at 1.4, which made weakly
    filtered fact×fact×fact joins blow up quadratically on one hot id —
    unrealistic vs IMDB and un-runnable for any engine)."""
    z = rng.zipf(1.05, size=n_rows)
    return ((z - 1) % n_parents + 1).astype(np.int64)


def _inject_cluster(out: dict[str, tuple[list, str]], S: dict[str, int]) -> None:
    """Overwrite reserved low ids + append correlated 'franchise' fact rows.

    JOB's filters describe real-world correlations (Downey Robert in
    post-2008 marvel-comics movies rated > 7.0 by [us] production
    companies…). Independent random draws make those intersections empty,
    so ~60 reserved 'blockbuster' titles + the named people/characters/
    companies (ids 1..N, which the zipf FKs also favor) get deterministic
    co-occurring cast/keyword/info/company/link rows. Every corpus family
    then selects a small-but-nonzero subset.
    """
    # ---- reserved dimension ids: the named banks, deterministically
    title_rows = out["title"][0]
    n_cluster = 60
    for i in range(1, n_cluster + 1):
        j = i - 1
        if i == 2:
            t_name = "Shrek 2"
        else:
            t_name = f"{_TITLE_WORDS[j % len(_TITLE_WORDS)]} {i}"
        if j % 6 == 5:  # some episodes of a cluster tv-series
            kind, ep_of, season, ep = 7, (j % 4) + 3, (j % 7) + 1, (j % 17) * 7 + 4
        elif j % 6 == 3:
            kind, ep_of, season, ep = 2, None, None, None  # tv series
        else:
            kind, ep_of, season, ep = 1, None, None, None  # movie
        year = 2004 + (j % 12) if j < 40 else 1950 + (j - 40) * 3
        title_rows[j] = (i, t_name, None, kind, year, None, None,
                        ep_of, season, ep, None, None)

    name_rows = out["name"][0]
    for i, nm in enumerate(_PERSON_NAMES, start=1):
        g = "f" if nm[0] in "AY" else "m"
        pcode = f"{nm[0]}{1234 + i}" if nm[0] <= "F" else f"D{4321 + i}"
        name_rows[i - 1] = (i, nm, None, None, g, pcode, None, None, None)

    char_rows = out["char_name"][0]
    for i, cn in enumerate(_CHAR_NAMES, start=1):
        char_rows[i - 1] = (i, cn, None, None, None, None, None)

    comp_rows = out["company_name"][0]
    for i, co in enumerate(_COMPANY_NAMES, start=1):
        comp_rows[i - 1] = (i, co, _CO_CODES[i - 1], None, None, None, None)

    # ---- appended correlated fact rows over the cluster titles
    def app(table: str, cols: tuple) -> None:
        rows = out[table][0]
        rows.append((len(rows) + 1, *cols))

    for m in range(1, n_cluster + 1):
        j = m - 1
        # cast: named people in named char roles, corpus note pool
        for k in range(4):
            person = (j + k) % len(_PERSON_NAMES) + 1
            app("cast_info", (person, m, (j + k) % len(_CHAR_NAMES) + 1,
                              _CI_NOTES[(j * 4 + k) % (len(_CI_NOTES) - 1)],
                              k + 1, [1, 2, 4, 7][(j + k) % 4]))
        # keywords: rotate through all named keywords
        for k in range(6):
            app("movie_keyword", (m, (j * 6 + k) % len(_NAMED_KEYWORDS) + 1))
        # movie_info: genre + country + language + release date (+ budget)
        app("movie_info", (m, _IT["genres"],
                           _GENRES[j % len(_GENRES)],
                           "(internet)" if j % 3 == 0 else None))
        app("movie_info", (m, _IT["countries"], _COUNTRIES[j % len(_COUNTRIES)], None))
        app("movie_info", (m, _IT["languages"], _LANGUAGES[j % len(_LANGUAGES)], None))
        y = 2005 + (j % 9) if j < 40 else 1950 + (j - 40) * 3
        rd = (f"USA: {(j % 27) + 1} {_MONTHS[j % 12]} {y}"
              if j % 2 else f"Japan:{y}")
        app("movie_info", (m, _IT["release dates"], rd, None))
        # ratings on the '7.0'/'8.0'/'8.5'/'9.0' equality grid + votes
        app("movie_info_idx", (m, _IT["rating"],
                               ["7.0", "8.0", "8.5", "9.0", "6.0", "6.5",
                                "5.0", "3.0", "3.5", "2.0"][j % 10], None))
        app("movie_info_idx", (m, [_IT["top 250 rank"], _IT["bottom 10 rank"],
                                   _IT["votes"]][j % 3],
                               str(10000 + j * 997) if j % 3 == 2
                               else f"{(j % 80) / 10 + 2:.1f}", None))
        # companies: named companies, both company types, corpus note shapes
        app("movie_companies", (m, j % len(_COMPANY_NAMES) + 1, j % 2 + 1,
                                [f"(presents) ({y})", f"(co-production) ({y}) (worldwide)",
                                 f"({y}) (USA) (TV)", f"({y}) (France) (VHS)",
                                 "(as Metro-Goldwyn-Mayer Pictures) (Blu-ray)",
                                 f"({y}) (Japan) (theatrical)", None][j % 7]))
        app("movie_companies", (m, (j + 5) % len(_COMPANY_NAMES) + 1, 2,
                                f"({y}) (USA)" if j % 2 else f"({y}) (Germany) (DVD)"))
        # complete_cast: cast/crew × complete/complete+verified
        app("complete_cast", (m, j % 2 + 1, j % 2 + 3))
        # links within the cluster: sequels/follows/references chains
        app("movie_link", (m, m % n_cluster + 1, j % len(_LINK_TYPES) + 1))
        app("aka_title", (m, f"AkaTitle c{m}", None, 1, None, None,
                          None, None, None, None, None))
    # person_info for the named people: biography/trivia/height, Boehm notes
    for i in range(1, len(_PERSON_NAMES) + 1):
        app("person_info", (i, _IT["mini biography"], f"bio text c{i}",
                            "Volker Boehm" if i % 2 else None))
        app("person_info", (i, _IT["trivia"], f"trivia c{i}",
                            "Volker Boehm" if i % 3 == 0 else None))
        app("person_info", (i, _IT["height"], "5' 10\"", None))
        app("aka_name", (i, f"Aka {_PERSON_NAMES[i - 1]}", None, None,
                         None, None, None))

    # ---- story rows: hand-correlated movies for the corpus families whose
    # predicate intersections the rotations above still miss. Cluster title
    # ids used (title word / year / kind from the loop above):
    #   2 'Shrek 2' 2005 movie        | 23 'Kung Fu Panda 23' 2014 movie
    #   40 'Kung Fu Panda 40' 2007 tv | 45 1962 movie | 20/21 2011/12 movies
    #   9 2012 movie | 12 2015 episode | 14 2005 movie | 16 2007 tv
    #   32 2011 movie | 22 2013 tv    | 4 & 28 2007 tv series
    K = {k: i + 1 for i, k in enumerate(_NAMED_KEYWORDS)}
    # Shrek 2 (q29 family): Queen voiced by an f '%An%' actress, complete
    # cast verified, computer-animation, USA/Japan 200x release dates
    app("cast_info", (11, 2, 3, "(voice)", 1, 2))       # Anna Angel as Queen
    app("cast_info", (13, 2, 3, "(voice) (uncredited)", 2, 2))  # Angel Ybarra
    app("complete_cast", (2, 1, 4))
    app("complete_cast", (2, 1, 3))
    app("movie_keyword", (2, K["computer-animation"]))
    app("movie_info", (2, _IT["release dates"], "USA: 19 May 2005", None))
    app("movie_info", (2, _IT["release dates"], "Japan:2005", None))
    app("movie_companies", (2, 7, 1, "(2005) (worldwide)"))  # DreamWorks [us]
    # Kung Fu Panda 2014 (q24b, q5b, q7b): DreamWorks, hero keywords,
    # USA:201x release, f '%An%' voice actress, (1994)(USA)(VHS) reissue
    for kw in ("hero", "martial-arts", "hand-to-hand-combat",
               "computer-animated-movie"):
        app("movie_keyword", (23, K[kw]))
    app("movie_info", (23, _IT["release dates"], "USA: 26 May 2014", None))
    app("movie_info", (23, _IT["countries"], "USA", None))
    app("movie_companies", (23, 7, 1, "(2014) (worldwide)"))
    app("movie_companies", (23, 3, 1, "(1994) (USA) (VHS)"))
    app("cast_info", (11, 23, 8, "(voice)", 1, 2))
    app("cast_info", (1, 23, 1, None, 2, 1))             # Downey as Tony Stark
    # Kung Fu Panda 2007 tv (q19b, q15b): YouTube worldwide 200x note,
    # internet release-date row, Japan:2007 + USA:2008-ish dates
    app("movie_info", (40, _IT["release dates"], "USA: 12 May 2008", "(internet)"))
    app("movie_info", (40, _IT["release dates"], "Japan:2007", None))
    app("movie_companies", (40, 8, 1, "(2008) (worldwide)"))  # YouTube [us]
    app("cast_info", (2, 40, 8, "(voice)", 1, 2))        # Angela Bertson
    # 1962 sequel/follows chain (q11a, q21a, q27a): Warner prod-co with NULL
    # note, Swedish/Germany info, complete cast
    app("movie_companies", (45, 1, 1, None))             # Warner Bros. [us]
    app("movie_keyword", (45, K["sequel"]))
    app("movie_link", (45, 46, 1))                       # follows
    app("movie_info", (45, _IT["languages"], "Swedish", None))
    app("movie_info", (45, _IT["countries"], "Germany", None))
    app("complete_cast", (45, 1, 3))
    # nordic murder pair (q14a, q22a, q28a): ratings 7.0/8.5, murder
    # keywords, German/Swedish info, non-us companies, 200x notes
    for m, rating, country, lang, co in ((20, "7.0", "Germany", "German", 6),
                                         (21, "8.5", "Sweden", "Swedish", 13)):
        for kw in ("murder", "murder-in-title", "blood", "violence"):
            app("movie_keyword", (m, K[kw]))
        app("movie_info", (m, _IT["countries"], country, None))
        app("movie_info", (m, _IT["languages"], lang, None))
        app("movie_info_idx", (m, _IT["rating"], rating, None))
        app("movie_companies", (m, co, 1, f"(200{m % 10}) (Germany)"))
        app("complete_cast", (m, 2, 3))                  # crew / complete
    # superhero 2012 (q26 family): Iron Man char, rating 8.0, complete cast
    for kw in ("superhero", "marvel-comics", "based-on-comic", "fight"):
        app("movie_keyword", (9, K[kw]))
    app("movie_info_idx", (9, _IT["rating"], "8.0", None))
    app("complete_cast", (9, 1, 3))
    app("cast_info", (1, 9, 2, None, 1, 1))              # Downey as Iron Man
    # 2015 superhero episode (q6b: production_year > 2014 + Downey)
    app("movie_keyword", (12, K["superhero"]))
    app("movie_keyword", (12, K["sequel"]))
    app("cast_info", (1, 12, 1, None, 1, 1))
    # [jp] voice-dub (q8a/q8b): 'One Piece 14' (2006), Universal [jp],
    # Japan-only (2006) note, Yolanda ('%Yo%', not '%Yu%') voice actress
    title_rows[13] = (14, "One Piece 14", None, 1, 2006, None, None,
                      None, None, None, None, None)
    app("movie_companies", (14, 9, 1, "(2006) (Japan) (theatrical)"))
    app("cast_info", (7, 14, 4, "(voice: English version)", 1, 2))
    # [us] 2007 (q9b): Angela '(voice)' actress, (USA) 200x note
    app("movie_companies", (16, 1, 1, "(2007) (USA)"))
    app("cast_info", (2, 16, 5, "(voice)", 1, 2))
    # [ru] producer (q10b): Mosfilm, actor with (producer) note, year 2011
    app("movie_companies", (32, 13, 1, None))
    app("cast_info", (5, 32, 6, "(producer)", 1, 1))     # Tim Xu, actor
    # Lionsgate writers room (q31b): writer-note cast, genres+rating rows
    app("movie_companies", (22, 5, 1, "(2010) (USA)"))
    for p, note in ((4, "(writer)"), (6, "(head writer)"), (3, "(written by)")):
        app("cast_info", (p, 22, 10, note, 1, 4))
    app("movie_info", (22, _IT["genres"], "Horror", None))
    app("movie_info_idx", (22, _IT["rating"], "7.0", None))
    app("movie_keyword", (22, K["murder"]))
    # linked tv-series pair (q33): follows link, ratings, [de] vs [us]
    app("movie_link", (4, 28, 1))
    app("movie_info_idx", (4, _IT["rating"], "8.0", None))
    app("movie_info_idx", (28, _IT["rating"], "7.0", None))
    app("movie_companies", (4, 6, 1, None))              # Lionsgate Films [de]
    app("movie_companies", (28, 1, 1, None))             # Warner Bros. [us]
    # features link between the two Kung Fu Pandas (q7 family)
    app("movie_link", (23, 40, 9))
    # murder-titled recent movies (q14b): '6.0' rating variant
    title_rows[19] = (20, "Murder Express 20", None, 1, 2011, None, None,
                      None, None, None, None, None)
    app("movie_info_idx", (20, _IT["rating"], "6.0", None))
    app("movie_info_idx", (21, _IT["rating"], "6.5", None))  # q28b
    # 1998 'Money' sequel (q11b/q27b): Warner, NULL note, follows chain
    title_rows[56] = (57, "Money Train 57", None, 1, 1998, None, None,
                      None, None, None, None, None)
    app("movie_companies", (57, 2, 1, None))             # Warner Home Video
    app("movie_keyword", (57, K["sequel"]))
    app("movie_link", (57, 58, 1))                       # follows
    app("movie_info", (57, _IT["languages"], "Swedish", None))
    app("movie_info", (57, _IT["countries"], "Germany", None))
    app("complete_cast", (57, 1, 3))
    # Saw franchise writers room (q31b): Lionsgate Blu-ray, votes row
    title_rows[21] = (22, "Saw 22", None, 2, 2013, None, None,
                      None, None, None, None, None)
    app("movie_companies", (22, 6, 1, "(2013) (Blu-ray)"))
    app("movie_info_idx", (22, _IT["votes"], "34567", None))
    # linked tv pair low ratings + [nl] co (q33b/q33c)
    app("movie_info_idx", (28, _IT["rating"], "3.0", None))
    app("movie_info_idx", (28, _IT["rating"], "3.5", None))
    app("movie_companies", (4, 10, 1, None))             # Best Film [nl]
    # marvel-cinematic-universe post-2014 (q6c)
    app("movie_keyword", (12, K["marvel-cinematic-universe"]))
    # 1980 Downey feature (q7b): features link, D-pcode male, Boehm bio
    app("cast_info", (1, 51, 1, None, 1, 1))
    app("movie_link", (51, 52, 9))                       # features


def mini_imdb_tables(seed: int = 42, scale: int = 1) -> dict[str, tuple[list, str]]:
    """Pure-Python/numpy row generation: table -> (rows, DDL schema).

    ``scale`` multiplies fact-table row counts (dimensions fixed), keeping
    distributions — the knob the JOB benchmark uses to grow the workload.
    """
    rng = np.random.default_rng(seed)
    S = dict(_IMDB_DIM_SIZES)
    S.update({k: v * scale for k, v in _IMDB_FACT_SIZES.items()})
    out: dict[str, tuple[list, str]] = {}

    def ids(n):
        return range(1, n + 1)

    out["company_type"] = (
        [(1, "production companies"), (2, "distributors"),
         (3, "special effects companies"), (4, None)],
        "id int, kind string",
    )
    out["comp_cast_type"] = (
        [(1, "cast"), (2, "crew"), (3, "complete"), (4, "complete+verified")],
        "id int, kind string",
    )
    out["info_type"] = (
        [(i, _INFO_TYPES[i - 1]) for i in ids(S["info_type"])],
        "id int, info string",
    )
    out["kind_type"] = (
        [(1, "movie"), (2, "tv series"), (3, "tv movie"), (4, "video movie"),
         (5, "tv mini series"), (6, "video game"), (7, "episode")],
        "id int, kind string",
    )
    out["link_type"] = (
        [(i, _LINK_TYPES[i - 1]) for i in ids(S["link_type"])],
        "id int, link string",
    )
    out["role_type"] = (
        [(1, "actor"), (2, "actress"), (3, "producer"), (4, "writer"),
         (5, "cinematographer"), (6, "composer"), (7, "costume designer"),
         (8, "director"), (9, "editor"), (10, "miscellaneous crew"),
         (11, "production designer"), (12, "guest")],
        "id int, role_name string",
    )
    out["keyword"] = (
        # keywords are unique (as in IMDB): ids 1..33 are the corpus's
        # filter literals, the rest generic fillers; fact FKs zipf-skew
        # toward low ids so the named keywords carry real row counts
        [(i,
          _NAMED_KEYWORDS[i - 1] if i <= len(_NAMED_KEYWORDS) else f"keyword-{i}",
          None)
         for i in ids(S["keyword"])],
        "id int, keyword string, phonetic_code string",
    )

    # ---- title: kind mix incl. episodes, themed titles the corpus LIKEs
    n = S["title"]
    kind_ids = rng.choice([1, 2, 3, 4, 5, 6, 7], n,
                          p=[0.45, 0.12, 0.08, 0.06, 0.04, 0.03, 0.22])
    years = rng.integers(1930, 2014, n)
    year_null = rng.random(n) < 0.05
    themed = rng.random(n) < 0.12
    word_ix = rng.integers(0, len(_TITLE_WORDS), n)
    ep_nr = rng.integers(1, 121, n)
    season = rng.integers(1, 21, n)
    ep_parent = rng.integers(1, n + 1, n)

    def _title(i):
        if i == 500:
            return "Shrek 2"
        if themed[i - 1]:
            return f"{_TITLE_WORDS[word_ix[i - 1]]} {i}"
        return f"Movie {i}"

    out["title"] = (
        [
            (i, _title(i), None, int(kind_ids[i - 1]),
             None if year_null[i - 1] else int(years[i - 1]),
             None, None,
             int(ep_parent[i - 1]) if kind_ids[i - 1] == 7 else None,
             int(season[i - 1]) if kind_ids[i - 1] == 7 else None,
             int(ep_nr[i - 1]) if kind_ids[i - 1] == 7 else None,
             None, None)
            for i in ids(n)
        ],
        "id int, title string, imdb_index string, kind_id int, "
        "production_year int, imdb_id int, phonetic_code string, "
        "episode_of_id int, season_nr int, episode_nr int, "
        "series_years string, md5sum string",
    )

    # ---- name: gendered, letter-coded pcode, corpus-matching name bank
    n = S["name"]
    genders = rng.choice(["m", "f", None], n, p=[0.55, 0.35, 0.10])
    named = rng.random(n) < 0.25
    name_ix = rng.integers(0, len(_PERSON_NAMES), n)
    pcode_letter = rng.integers(0, 26, n)
    pcode_num = rng.integers(1000, 9999, n)
    out["name"] = (
        [
            (i,
             f"{_PERSON_NAMES[name_ix[i - 1]]} {i}" if named[i - 1] else f"Name {i}",
             None, None, genders[i - 1],
             f"{chr(65 + pcode_letter[i - 1])}{pcode_num[i - 1]}",
             None, None, None)
            for i in ids(n)
        ],
        "id int, name string, imdb_index string, imdb_id int, gender string, "
        "name_pcode_cf string, name_pcode_nf string, surname_pcode string, "
        "md5sum string",
    )

    n = S["char_name"]
    named = rng.random(n) < 0.30
    char_ix = rng.integers(0, len(_CHAR_NAMES), n)
    out["char_name"] = (
        [
            (i,
             _CHAR_NAMES[char_ix[i - 1]] if named[i - 1] else f"Char {i}",
             None, None, None, None, None)
            for i in ids(n)
        ],
        "id int, name string, imdb_index string, imdb_id int, "
        "name_pcode_nf string, surname_pcode string, md5sum string",
    )

    n = S["company_name"]
    ccodes = rng.choice(
        ["[us]", "[de]", "[pl]", "[gb]", "[fr]", "[jp]", "[nl]", "[ru]",
         "[sm]", "[it]", None],
        n, p=[0.32, 0.10, 0.05, 0.12, 0.08, 0.05, 0.03, 0.03, 0.01, 0.03, 0.18])
    named = rng.random(n) < 0.20
    co_ix = rng.integers(0, len(_COMPANY_NAMES), n)
    out["company_name"] = (
        [
            (i,
             _COMPANY_NAMES[co_ix[i - 1]] if named[i - 1] else f"Company {i}",
             ccodes[i - 1], None, None, None, None)
            for i in ids(n)
        ],
        "id int, name string, country_code string, imdb_id int, "
        "name_pcode_nf string, name_pcode_sf string, md5sum string",
    )

    n = S["aka_name"]
    an_person = _skewed_fk(rng, n, S["name"])
    out["aka_name"] = (
        [
            (i, int(an_person[i - 1]), f"Aka {i}", None, None, None, None, None)
            for i in ids(n)
        ],
        "id int, person_id int, name string, imdb_index string, "
        "name_pcode_cf string, name_pcode_nf string, surname_pcode string, "
        "md5sum string",
    )
    n = S["aka_title"]
    at_movie = _skewed_fk(rng, n, S["title"])
    out["aka_title"] = (
        [
            (i, int(at_movie[i - 1]), f"AkaTitle {i}", None, 1,
             None, None, None, None, None, None, None)
            for i in ids(n)
        ],
        "id int, movie_id int, title string, imdb_index string, kind_id int, "
        "production_year int, phonetic_code string, episode_of_id int, "
        "season_nr int, episode_nr int, note string, md5sum string",
    )

    # ---- cast_info: corpus note pool, skewed movie/person FKs
    n = S["cast_info"]
    ci_movie = _skewed_fk(rng, n, S["title"])
    ci_person = _skewed_fk(rng, n, S["name"])
    ci_role = rng.integers(1, 13, n)
    ci_pr = rng.integers(1, S["char_name"] + 1, n)
    ci_pr_null = rng.random(n) < 0.3
    ci_notes = rng.choice(np.array(_CI_NOTES, dtype=object), n, p=_CI_NOTE_P)
    out["cast_info"] = (
        [
            (i, int(ci_person[i - 1]), int(ci_movie[i - 1]),
             None if ci_pr_null[i - 1] else int(ci_pr[i - 1]),
             ci_notes[i - 1], None, int(ci_role[i - 1]))
            for i in ids(n)
        ],
        "id int, person_id int, movie_id int, person_role_id int, "
        "note string, nr_order int, role_id int",
    )

    # ---- movie_info: info value correlated with its info_type, matching
    # the corpus's genre/country/language/release-date predicates
    n = S["movie_info"]
    mi_movie = _skewed_fk(rng, n, S["title"])
    named_types = np.array([_IT["genres"], _IT["countries"], _IT["languages"],
                            _IT["release dates"], _IT["budget"], 0])
    type_pick = rng.choice(6, n, p=[0.22, 0.14, 0.14, 0.16, 0.04, 0.30])
    mi_it = named_types[type_pick]
    generic_it = rng.integers(1, S["info_type"] + 1, n)
    mi_it = np.where(mi_it == 0, generic_it, mi_it)
    g_ix = rng.integers(0, len(_GENRES), n)
    c_ix = rng.integers(0, len(_COUNTRIES), n)
    l_ix = rng.integers(0, len(_LANGUAGES), n)
    rd_country = rng.choice(["USA", "Japan", "Germany", "France"], n,
                            p=[0.45, 0.2, 0.2, 0.15])
    rd_month = rng.integers(0, 12, n)
    rd_day = rng.integers(1, 29, n)
    rd_year = rng.integers(1988, 2013, n)
    rd_short = rng.random(n) < 0.3  # 'USA: 2007' (no day/month) variant
    note_internet = rng.random(n) < 0.12

    def _mi_info(i):
        it = int(mi_it[i - 1])
        j = i - 1
        if it == _IT["genres"]:
            return _GENRES[g_ix[j]]
        if it == _IT["countries"]:
            return _COUNTRIES[c_ix[j]]
        if it == _IT["languages"]:
            return _LANGUAGES[l_ix[j]]
        if it == _IT["release dates"]:
            if rd_short[j]:
                return f"{rd_country[j]}:{rd_year[j]}"
            return f"{rd_country[j]}: {rd_day[j]} {_MONTHS[rd_month[j]]} {rd_year[j]}"
        if it == _IT["budget"]:
            return f"${(j % 90) + 1},000,000"
        return f"iv_{j % 50}"

    out["movie_info"] = (
        [
            (i, int(mi_movie[i - 1]), int(mi_it[i - 1]), _mi_info(i),
             "(internet)" if note_internet[i - 1] else None)
            for i in ids(n)
        ],
        "id int, movie_id int, info_type_id int, info string, note string",
    )

    # ---- movie_info_idx: rating / top-250 / bottom-10 / votes
    n = S["movie_info_idx"]
    mix_movie = _skewed_fk(rng, n, S["title"])
    mix_it = rng.choice([_IT["rating"], _IT["top 250 rank"],
                         _IT["bottom 10 rank"], _IT["votes"]],
                        n, p=[0.6, 0.15, 0.1, 0.15])
    ratings = rng.integers(20, 100, n) / 10.0
    votes = rng.integers(100, 2_000_000, n)
    out["movie_info_idx"] = (
        [
            (i, int(mix_movie[i - 1]), int(mix_it[i - 1]),
             str(int(votes[i - 1])) if mix_it[i - 1] == _IT["votes"]
             else f"{ratings[i - 1]:.1f}",
             None)
            for i in ids(n)
        ],
        "id int, movie_id int, info_type_id int, info string, note string",
    )

    # ---- movie_companies: composed notes ('(2006) (USA) (TV)' style)
    n = S["movie_companies"]
    mc_movie = _skewed_fk(rng, n, S["title"])
    mc_co = rng.integers(1, S["company_name"] + 1, n)
    mc_ct = rng.integers(1, 3, n)
    note_null = rng.random(n) < 0.35
    role_on = rng.random(n) < 0.5
    year_on = rng.random(n) < 0.6
    region_on = rng.random(n) < 0.6
    media_on = rng.random(n) < 0.4
    role_ix = rng.integers(0, len(_MC_ROLE), n)
    year_v = rng.integers(1988, 2013, n)
    region_ix = rng.integers(0, len(_MC_REGION), n)
    media_ix = rng.integers(0, len(_MC_MEDIA), n)

    def _mc_note(j):
        if note_null[j]:
            return None
        parts = []
        if role_on[j]:
            parts.append(_MC_ROLE[role_ix[j]])
        if year_on[j]:
            parts.append(f"({year_v[j]})")
        if region_on[j]:
            parts.append(_MC_REGION[region_ix[j]])
        if media_on[j]:
            parts.append(_MC_MEDIA[media_ix[j]])
        return " ".join(parts) if parts else None

    out["movie_companies"] = (
        [
            (i, int(mc_movie[i - 1]), int(mc_co[i - 1]), int(mc_ct[i - 1]),
             _mc_note(i - 1))
            for i in ids(n)
        ],
        "id int, movie_id int, company_id int, company_type_id int, note string",
    )

    n = S["movie_keyword"]
    mk_movie = _skewed_fk(rng, n, S["title"])
    mk_kw = _skewed_fk(rng, n, S["keyword"])  # skew toward named keywords
    out["movie_keyword"] = (
        [(i, int(mk_movie[i - 1]), int(mk_kw[i - 1])) for i in ids(n)],
        "id int, movie_id int, keyword_id int",
    )

    n = S["movie_link"]
    ml_movie = rng.integers(1, S["title"] + 1, n)
    ml_linked = rng.integers(1, S["title"] + 1, n)
    ml_lt = rng.integers(1, S["link_type"] + 1, n)
    out["movie_link"] = (
        [
            (i, int(ml_movie[i - 1]), int(ml_linked[i - 1]), int(ml_lt[i - 1]))
            for i in ids(n)
        ],
        "id int, movie_id int, linked_movie_id int, link_type_id int",
    )
    n = S["complete_cast"]
    cc_movie = rng.integers(1, S["title"] + 1, n)
    cc_subj = rng.integers(1, 3, n)
    cc_stat = rng.integers(3, 5, n)
    out["complete_cast"] = (
        [
            (i, int(cc_movie[i - 1]), int(cc_subj[i - 1]), int(cc_stat[i - 1]))
            for i in ids(n)
        ],
        "id int, movie_id int, subject_id int, status_id int",
    )

    # ---- person_info: mini biography / trivia / height; Volker Boehm notes
    n = S["person_info"]
    pi_person = _skewed_fk(rng, n, S["name"])
    pi_it = rng.choice([_IT["mini biography"], _IT["trivia"], _IT["height"]],
                       n, p=[0.5, 0.3, 0.2])
    pi_volker = rng.random(n) < 0.10
    out["person_info"] = (
        [
            (i, int(pi_person[i - 1]), int(pi_it[i - 1]), f"bio text {i}",
             "Volker Boehm" if pi_volker[i - 1] else None)
            for i in ids(n)
        ],
        "id int, person_id int, info_type_id int, info string, note string",
    )

    _inject_cluster(out, S)
    return out


def mini_imdb_dfs(
    spark: SparkSession, seed: int = 42, scale: int = 1
) -> dict[str, DataFrame]:
    return {
        name: spark.createDataFrame(rows, schema)
        for name, (rows, schema) in mini_imdb_tables(seed, scale).items()
    }


def write_mini_imdb(spark: SparkSession, out_dir: str, seed: int = 42) -> dict[str, str]:
    paths = {}
    for name, df in mini_imdb_dfs(spark, seed).items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths


# ---- Spark-free materialization (pyarrow): the JOB correctness gate needs
# the fixture on disk for BOTH engines; DuckDB's side must not need a JVM.

_DDL_TO_ARROW = {"int": "int32", "string": "string"}


def write_mini_imdb_arrow(out_dir: str, seed: int = 42, scale: int = 1) -> dict[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, (rows, ddl) in mini_imdb_tables(seed, scale).items():
        fields = []
        for item in ddl.split(","):
            col, typ = item.split()
            fields.append(pa.field(col, getattr(pa, _DDL_TO_ARROW[typ])()))
        schema = pa.schema(fields)
        cols = [
            pa.array([r[i] for r in rows], type=fields[i].type)
            for i in range(len(fields))
        ]
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_arrays(cols, schema=schema), path)
        paths[name] = path
    return paths


_FIXTURE_LOCK = threading.Lock()


def ensure_job_fixture(
    base_dir: str | None = None, seed: int = 42, scale: int = 1
) -> dict[str, str]:
    """Idempotently materialize the mini-IMDB fixture as parquet and return
    table -> file path. Safe to call from both the Spark query builder and
    the DuckDB oracle generator; the first caller writes (to a temp dir,
    atomically renamed), everyone else reuses."""
    if base_dir is None:
        base_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".fixtures")
    tag = f"mini_imdb_v{FIXTURE_VERSION}_seed{seed}_x{scale}"
    final = os.path.join(base_dir, tag)
    marker = os.path.join(final, "_FIXTURE_OK")
    names = list(_IMDB_DIM_SIZES) + list(_IMDB_FACT_SIZES)
    with _FIXTURE_LOCK:  # serialize within this process; cheap fast path
        if not os.path.isfile(marker):
            # Cross-PROCESS safety (pytest-xdist, the driver's separate
            # oracle process): stage into a mkdtemp-unique dir — two writers
            # can never share a staging path — then publish with one atomic
            # rename. A lost race leaves `final` already present; the loser
            # just discards its staging copy. The old deterministic
            # `final + ".tmp"` path let a second writer rmtree/overwrite the
            # first one's half-written files and still publish the marker.
            os.makedirs(base_dir, exist_ok=True)
            tmp = tempfile.mkdtemp(prefix=tag + ".stage-", dir=base_dir)
            try:
                write_mini_imdb_arrow(tmp, seed=seed, scale=scale)
                with open(os.path.join(tmp, "_FIXTURE_OK"), "w") as f:
                    f.write(tag)
                try:
                    os.rename(tmp, final)
                except OSError:
                    if not os.path.isfile(marker):
                        raise  # final exists but is not a valid fixture
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    return {n: os.path.join(final, f"{n}.parquet") for n in names}

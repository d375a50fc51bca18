"""Deterministic test fixtures (FIXTURES.md A & B; SURVEY.md §5).

A. ``typed_test`` — the scalar-type/null coverage table mirroring the
   reference's SQLite-differential `test` table (mapd-core/Tests/
   ExecuteTest.cpp:4033-4073: 29 typed columns, 3 row templates ×
   g_num_rows).
B. ``mini_imdb`` — an IMDB-shaped star (dataset/schematext.sql ratios at
   ~1/1000 scale) with skewed fact FKs, for JOB-shaped join-order queries
   (queries/1a.sql.sq.cnt, 29a self-alias stress).

Both are seeded and pure-Python generated; write_*(spark, dir) materialize
parquet so Spark and DuckDB read identical bytes (the differential-oracle
discipline of SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt
import os
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

# (table, rows) at ~1/1000 IMDB scale (dataset/README.md counts)
_IMDB_SIZES = {
    "company_type": 4,
    "comp_cast_type": 4,
    "info_type": 113,
    "kind_type": 7,
    "link_type": 18,
    "role_type": 12,
    "title": 2500,
    "name": 4200,
    "char_name": 3100,
    "company_name": 235,
    "keyword": 130,
    "aka_name": 900,
    "aka_title": 360,
    "cast_info": 36000,
    "movie_info": 14800,
    "movie_info_idx": 1380,
    "movie_companies": 2600,
    "movie_keyword": 4500,
    "movie_link": 30,
    "complete_cast": 135,
    "person_info": 2760,
}

_INFO_TYPES = [
    "rating", "genres", "top 250 rank", "bottom 10 rank", "votes",
    "release dates", "languages", "countries", "budget", "runtimes",
    "color info", "sound mix", "certificates", "mini biography",
    "birth notes", "height",
] + [f"info_{i}" for i in range(97)]


def _skewed_fk(rng: np.random.Generator, n_rows: int, n_parents: int) -> np.ndarray:
    """Zipf-flavored FK: a few 'blockbuster' parents own a large share —
    join-order choice must matter (FIXTURES.md B)."""
    z = rng.zipf(1.4, size=n_rows)
    return ((z - 1) % n_parents + 1).astype(np.int64)


def mini_imdb_dfs(spark: SparkSession, seed: int = 42) -> dict[str, DataFrame]:
    rng = np.random.default_rng(seed)
    S = _IMDB_SIZES
    out: dict[str, list | tuple] = {}

    def ids(n):
        return np.arange(1, n + 1)

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
        [(int(i), _INFO_TYPES[i - 1]) for i in ids(S["info_type"])],
        "id int, info string",
    )
    out["kind_type"] = (
        [(1, "movie"), (2, "tv series"), (3, "tv movie"), (4, "video movie"),
         (5, "tv mini series"), (6, "video game"), (7, None)],
        "id int, kind string",
    )
    out["link_type"] = (
        [(int(i), f"link_{i}") for i in ids(S["link_type"])],
        "id int, link string",
    )
    out["role_type"] = (
        [(1, "actor"), (2, "actress"), (3, "producer"), (4, "writer"),
         (5, "cinematographer"), (6, "composer"), (7, "costume designer"),
         (8, "director"), (9, "editor"), (10, "miscellaneous crew"),
         (11, "production designer"), (12, "guest")],
        "id int, role_name string",
    )

    n = S["title"]
    years = rng.integers(1930, 2014, n)
    out["title"] = (
        [
            (int(i), f"Movie {i}", None, int(rng.integers(1, 8)),
             int(years[i - 1]) if rng.random() > 0.05 else None,
             None, None, None, None, None, None, None)
            for i in ids(n)
        ],
        "id int, title string, imdb_index string, kind_id int, "
        "production_year int, imdb_id int, phonetic_code string, "
        "episode_of_id int, season_nr int, episode_nr int, "
        "series_years string, md5sum string",
    )

    n = S["name"]
    genders = rng.choice(["m", "f", None], n, p=[0.55, 0.35, 0.10])
    out["name"] = (
        [
            (int(i), f"Name {i}", None, None, genders[i - 1],
             f"P{i % 100}", None, None, None)
            for i in ids(n)
        ],
        "id int, name string, imdb_index string, imdb_id int, gender string, "
        "name_pcode_cf string, name_pcode_nf string, surname_pcode string, "
        "md5sum string",
    )
    out["char_name"] = (
        [
            (int(i), f"Char {i}", None, None, None, None, None)
            for i in ids(S["char_name"])
        ],
        "id int, name string, imdb_index string, imdb_id int, "
        "name_pcode_nf string, surname_pcode string, md5sum string",
    )
    n = S["company_name"]
    ccodes = rng.choice(["[us]", "[de]", "[pl]", "[gb]", "[fr]", None],
                        n, p=[0.35, 0.12, 0.05, 0.18, 0.10, 0.20])
    out["company_name"] = (
        [
            (int(i), f"Company {i}", ccodes[i - 1], None, None, None, None)
            for i in ids(n)
        ],
        "id int, name string, country_code string, imdb_id int, "
        "name_pcode_nf string, name_pcode_sf string, md5sum string",
    )
    out["keyword"] = (
        [
            (int(i), f"keyword-{i}" if i % 10 else "character-name-in-title",
             None)
            for i in ids(S["keyword"])
        ],
        "id int, keyword string, phonetic_code string",
    )
    out["aka_name"] = (
        [
            (int(i), int(_skewed_fk(rng, 1, S["name"])[0]), f"Aka {i}",
             None, None, None, None, None)
            for i in ids(S["aka_name"])
        ],
        "id int, person_id int, name string, imdb_index string, "
        "name_pcode_cf string, name_pcode_nf string, surname_pcode string, "
        "md5sum string",
    )
    out["aka_title"] = (
        [
            (int(i), int(_skewed_fk(rng, 1, S["title"])[0]), f"AkaTitle {i}",
             None, 1, None, None, None, None, None, None, None)
            for i in ids(S["aka_title"])
        ],
        "id int, movie_id int, title string, imdb_index string, kind_id int, "
        "production_year int, phonetic_code string, episode_of_id int, "
        "season_nr int, episode_nr int, note string, md5sum string",
    )

    n = S["cast_info"]
    ci_movie = _skewed_fk(rng, n, S["title"])
    ci_person = _skewed_fk(rng, n, S["name"])
    ci_role = rng.integers(1, 13, n)
    ci_pr = rng.integers(1, S["char_name"] + 1, n)
    ci_notes = rng.choice(
        ["(voice)", "(voice: Japanese version)", "(voice) (uncredited)",
         "(producer)", "(executive producer)", None],
        n, p=[0.08, 0.02, 0.02, 0.05, 0.04, 0.79])
    out["cast_info"] = (
        [
            (int(i), int(ci_person[i - 1]), int(ci_movie[i - 1]),
             int(ci_pr[i - 1]) if rng.random() > 0.3 else None,
             ci_notes[i - 1], None, int(ci_role[i - 1]))
            for i in ids(n)
        ],
        "id int, person_id int, movie_id int, person_role_id int, "
        "note string, nr_order int, role_id int",
    )

    n = S["movie_info"]
    mi_movie = _skewed_fk(rng, n, S["title"])
    mi_it = rng.integers(1, S["info_type"] + 1, n)
    genres = ["Drama", "Comedy", "Action", "Thriller", "Horror", "Documentary"]
    out["movie_info"] = (
        [
            (int(i), int(mi_movie[i - 1]), int(mi_it[i - 1]),
             genres[i % 6] if mi_it[i - 1] == 2 else f"iv_{i % 50}",
             None if i % 3 else "(internet)")
            for i in ids(n)
        ],
        "id int, movie_id int, info_type_id int, info string, note string",
    )

    n = S["movie_info_idx"]
    mix_movie = _skewed_fk(rng, n, S["title"])
    ratings = rng.integers(20, 100, n) / 10.0
    out["movie_info_idx"] = (
        [
            (int(i), int(mix_movie[i - 1]), 1 if i % 3 else 3,
             f"{ratings[i - 1]:.1f}", None)
            for i in ids(n)
        ],
        "id int, movie_id int, info_type_id int, info string, note string",
    )

    n = S["movie_companies"]
    mc_movie = _skewed_fk(rng, n, S["title"])
    mc_co = rng.integers(1, S["company_name"] + 1, n)
    mc_notes = rng.choice(
        ["(presents)", "(co-production)", "(as Metro-Goldwyn-Mayer Pictures)",
         "(in association with)", None],
        n, p=[0.15, 0.10, 0.05, 0.10, 0.60])
    out["movie_companies"] = (
        [
            (int(i), int(mc_movie[i - 1]), int(mc_co[i - 1]),
             int(rng.integers(1, 3)), mc_notes[i - 1])
            for i in ids(n)
        ],
        "id int, movie_id int, company_id int, company_type_id int, note string",
    )

    n = S["movie_keyword"]
    mk_movie = _skewed_fk(rng, n, S["title"])
    mk_kw = rng.integers(1, S["keyword"] + 1, n)
    out["movie_keyword"] = (
        [(int(i), int(mk_movie[i - 1]), int(mk_kw[i - 1])) for i in ids(n)],
        "id int, movie_id int, keyword_id int",
    )
    out["movie_link"] = (
        [
            (int(i), int(rng.integers(1, S["title"] + 1)),
             int(rng.integers(1, S["title"] + 1)),
             int(rng.integers(1, S["link_type"] + 1)))
            for i in ids(S["movie_link"])
        ],
        "id int, movie_id int, linked_movie_id int, link_type_id int",
    )
    out["complete_cast"] = (
        [
            (int(i), int(rng.integers(1, S["title"] + 1)),
             int(rng.integers(1, 3)), int(rng.integers(3, 5)))
            for i in ids(S["complete_cast"])
        ],
        "id int, movie_id int, subject_id int, status_id int",
    )
    n = S["person_info"]
    pi_person = _skewed_fk(rng, n, S["name"])
    out["person_info"] = (
        [
            (int(i), int(pi_person[i - 1]),
             14 if i % 4 else 16, f"bio text {i}", None)
            for i in ids(n)
        ],
        "id int, person_id int, info_type_id int, info string, note string",
    )

    return {
        name: spark.createDataFrame(rows, schema)
        for name, (rows, schema) in out.items()
    }


def write_mini_imdb(spark: SparkSession, out_dir: str, seed: int = 42) -> dict[str, str]:
    paths = {}
    for name, df in mini_imdb_dfs(spark, seed).items():
        p = os.path.join(out_dir, f"{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p)
        paths[name] = p
    return paths

"""Statistical CDF family (functions/stats.py; MathFunctions.java
:225-1020) + the round-3 binary/json/array/ip scalar additions.

The CDFs have no DuckDB twin, so correctness comes from mathematical
identities with independently-known values (closed forms, symmetry,
inverse round-trips) — the same strategy the reference's own
TestMathFunctions uses (asserts against Apache Commons values)."""

from __future__ import annotations

import math

import pytest

from presto_copy_spark.functions import register_all
from presto_copy_spark.functions import stats as S


@pytest.fixture(scope="module", autouse=True)
def _reg(spark):
    register_all(spark)


def test_cdf_known_values():
    assert S.normal_cdf(0, 1, 0) == 0.5
    assert abs(S.normal_cdf(0, 1, 1.959963984540054) - 0.975) < 1e-12
    assert abs(S.cauchy_cdf(0, 1, 1) - 0.75) < 1e-12
    assert abs(S.chi_squared_cdf(2, 2 * math.log(2)) - 0.5) < 1e-12
    assert abs(S.gamma_cdf(1, 2, 2 * math.log(2)) - 0.5) < 1e-12  # Exp(2)
    assert abs(S.weibull_cdf(1, 1, math.log(2)) - 0.5) < 1e-12
    assert abs(S.beta_cdf(2, 2, 0.5) - 0.5) < 1e-12
    # arcsine law: Beta(1/2, 1/2) CDF = 2/pi * asin(sqrt(x))
    assert abs(S.beta_cdf(0.5, 0.5, 0.25) - 2 / math.pi * math.asin(0.5)) < 1e-12
    assert abs(S.f_cdf(1, 1, 1) - 0.5) < 1e-12
    exact_binom = sum(math.comb(10, k) for k in range(6)) / 1024
    assert abs(S.binomial_cdf(10, 0.5, 5) - exact_binom) < 1e-12
    exact_pois = math.exp(-2) * (1 + 2 + 2 + 4 / 3)
    assert abs(S.poisson_cdf(2.0, 3) - exact_pois) < 1e-12


@pytest.mark.parametrize(
    "cdf,inv,args",
    [
        (S.normal_cdf, S.inverse_normal_cdf, (1.0, 2.0)),
        (S.beta_cdf, S.inverse_beta_cdf, (2.0, 3.0)),
        (S.cauchy_cdf, S.inverse_cauchy_cdf, (0.0, 1.0)),
        (S.gamma_cdf, S.inverse_gamma_cdf, (2.0, 3.0)),
        (S.laplace_cdf, S.inverse_laplace_cdf, (0.0, 2.0)),
        (S.weibull_cdf, S.inverse_weibull_cdf, (1.5, 2.0)),
        (S.f_cdf, S.inverse_f_cdf, (3.0, 7.0)),
        (S.chi_squared_cdf, S.inverse_chi_squared_cdf, (5.0,)),
    ],
)
def test_cdf_inverse_roundtrip(cdf, inv, args):
    for p in (0.01, 0.25, 0.5, 0.9, 0.99):
        x = inv(*args, p)
        assert abs(cdf(*args, x) - p) < 1e-9, (cdf.__name__, p)


def test_inverse_poisson_is_discrete_quantile():
    for p in (0.1, 0.5, 0.9):
        k = S.inverse_poisson_cdf(3.0, p)
        assert S.poisson_cdf(3.0, k) >= p
        assert k == 0 or S.poisson_cdf(3.0, k - 1) < p


def test_cdf_sql_surface(spark):
    row = spark.sql(
        "SELECT normal_cdf(0.0, 1.0, 1.96) a, binomial_cdf(10, 0.5, 5) b,"
        " inverse_poisson_cdf(3.0, 0.5) c, laplace_cdf(0.0, 1.0, 0.0) d,"
        " inverse_normal_cdf(0.0, 1.0, normal_cdf(0.0, 1.0, 1.5)) e"
    ).collect()[0]
    assert abs(row.a - 0.9750021048517796) < 1e-12
    assert abs(row.b - 0.623046875) < 1e-12
    assert row.c == 3 and row.d == 0.5
    assert abs(row.e - 1.5) < 1e-9


def test_cdf_domain_errors():
    with pytest.raises(ValueError):
        S.normal_cdf(0, -1, 0)
    with pytest.raises(ValueError):
        S.beta_cdf(0, 1, 0.5)
    with pytest.raises(ValueError):
        S.binomial_cdf(0, 0.5, 1)


# ---------------------------------------------------------------------------
def test_binary_endian_and_ieee754(spark):
    """BinaryFunctions.java to/from_big_endian + IEEE754 round-trips,
    incl. Long.MIN_VALUE and negative 32-bit."""
    row = spark.sql(
        "SELECT from_big_endian_64(to_big_endian_64(-5)) a,"
        " from_big_endian_64(to_big_endian_64(-9223372036854775808)) b,"
        " from_big_endian_32(to_big_endian_32(-7)) c,"
        " hex(to_big_endian_64(255)) d,"
        " from_ieee754_64(to_ieee754_64(1.5)) e,"
        " hex(sha256(to_utf8('a'))) f"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (-5, -9223372036854775808, -7)
    assert row.d == "00000000000000FF"
    assert row.e == 1.5
    import hashlib

    assert row.f == hashlib.sha256(b"a").hexdigest().upper()


def test_hmac_matches_stdlib(spark):
    import hmac

    row = spark.sql(
        "SELECT hex(hmac_sha256(to_utf8('msg'), to_utf8('key'))) x"
    ).collect()[0]
    assert row.x == hmac.new(b"key", b"msg", "sha256").hexdigest().upper()


def test_array_tier2_sql_twins(spark):
    row = spark.sql(
        "SELECT array_sort_desc(array(1.0, 3.0, CAST(NULL AS DOUBLE), 2.0)) a,"
        " array_top_n(array(3.0, 1.0, 2.0), 2) b,"
        " remove_nulls(array(1.0, CAST(NULL AS DOUBLE))) c,"
        " array_split_into_chunks(array(1.0, 2.0, 3.0, 4.0, 5.0), 2) d"
    ).collect()[0]
    assert row.a == [3.0, 2.0, 1.0, None]  # NULLs at the END (Presto)
    assert row.b == [3.0, 2.0] and row.c == [1.0]
    assert row.d == [[1.0, 2.0], [3.0, 4.0], [5.0]]


def test_json_and_ip_helpers(spark):
    row = spark.sql(
        "SELECT json_array_get('[1,2,3]', 1) a,"
        " json_array_contains('[\"a\",\"b\"]', 'b') b,"
        " is_json_scalar('1') c, is_json_scalar('[1]') d,"
        " is_private_ip('10.0.0.1') e, is_private_ip('8.8.8.8') f,"
        " is_private_ip('fe80::1') g,"
        " cosine_similarity(map('a', 1.0, 'b', 0.0), map('a', 1.0, 'b', 0.0)) h,"
        " year_of_week(DATE '2005-01-02') i"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == ("2", True, True, False)
    assert (row.e, row.f, row.g) == (True, False, True)
    assert row.h == 1.0 and row.i == 2004


def test_hash_functions_published_vectors(spark):
    """FNV-1/1a and MurmurHash3 x64_128 against the published test
    vectors (FNV test suite; Appleby's reference x64_128 of 'hello')."""
    row = spark.sql(
        "SELECT fnv1_64(to_utf8('a')) a, fnv1a_64(to_utf8('a')) b,"
        " fnv1_32(to_utf8('a')) c, fnv1a_32(to_utf8('a')) d,"
        " hex(murmur3_x64_128(to_utf8('hello'))) e,"
        " hex(murmur3_x64_128(to_utf8(''))) f"
    ).collect()[0]
    assert row.a + (1 << 64) == 0xAF63BD4C8601B7BE
    assert row.b + (1 << 64) == 0xAF63DC4C8601EC8C
    assert row.c == 0x050C5D7E
    assert row.d == 0xE40C292C
    assert row.e == "029BBD41B3A7D8CB191DAE486A901E5B"
    assert row.f == "0" * 32


def test_regex_presto_semantics(spark):
    """2-arg regexp_extract[_all] = full match (group 0);
    regexp_split / regexp_position; 2-arg bit_count width masking."""
    from presto_copy_spark.dialect import transpile

    row = spark.sql(
        transpile(
            "SELECT regexp_extract('abc123', '[0-9]+') a,"
            " regexp_extract('a1b2', '([a-z])([0-9])', 2) b,"
            " regexp_extract_all('a1b2', '[0-9]') c,"
            " regexp_split('a1b2', '[0-9]') d,"
            " regexp_position('abc', 'b') e, regexp_position('abc', 'z') f,"
            " bit_count(9, 8) g, bit_count(-7, 64) h, bit_count(-7, 8) i,"
            " bitwise_right_shift_arithmetic(-16, 3) j"
        )
    ).collect()[0]
    assert (row.a, row.b) == ("123", "1")
    assert row.c == ["1", "2"] and row.d == ["a", "b", ""]
    assert (row.e, row.f) == (2, -1)
    assert (row.g, row.h, row.i, row.j) == (2, 62, 6, -2)


def test_base32_and_bitwise_aggs(spark):
    from presto_copy_spark.dialect import transpile

    row = spark.sql(
        transpile(
            "SELECT from_utf8(from_base32(to_base32(to_utf8('abc')))) a,"
            " (SELECT bitwise_and_agg(x) FROM (VALUES 5, 3) t(x)) b,"
            " (SELECT bitwise_or_agg(x) FROM (VALUES 5, 3) t(x)) c"
        )
    ).collect()[0]
    assert (row.a, row.b, row.c) == ("abc", 1, 7)


def test_timezone_functions(spark):
    """to_milliseconds / timezone_hour/minute / at_timezone /
    with_timezone (DateTimeFunctions.java:318-351, 1261-1276, 1467)."""
    row = spark.sql(
        "SELECT to_milliseconds(INTERVAL '3.5' SECOND) a,"
        " timezone_hour(TIMESTAMP '2024-01-01 00:00:00') b,"
        " timezone_minute(TIMESTAMP '2024-01-01 00:00:00') c,"
        " CAST(at_timezone(TIMESTAMP '2024-01-01 00:00:00',"
        "      'America/Los_Angeles') AS STRING) d,"
        " CAST(with_timezone(TIMESTAMP '2024-01-01 00:00:00',"
        "      'America/Los_Angeles') AS STRING) e"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (3500, 0, 0)
    # instant preserved, wall clock re-rendered in LA (UTC-8 in winter)
    assert row.d == "2023-12-31 16:00:00"
    # wall clock re-interpreted as LA time -> 8h later as a UTC instant
    assert row.e == "2024-01-01 08:00:00"


def test_misc_scalar_additions(spark):
    """week rename, strrpos, combine_hash, great_circle_distance (vs the
    reference formula), width-masked shifts, split_to_multimap, fail."""
    import math

    from presto_copy_spark.dialect import transpile

    def ref_gcd(lat1, lon1, lat2, lon2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dl = math.radians(lon1) - math.radians(lon2)
        t1 = math.cos(rl2) * math.sin(dl)
        t2 = math.cos(rl1) * math.sin(rl2) - math.sin(rl1) * math.cos(rl2) * math.cos(dl)
        t3 = math.sin(rl1) * math.sin(rl2) + math.cos(rl1) * math.cos(rl2) * math.cos(dl)
        return math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * 6371.01

    row = spark.sql(
        transpile(
            "SELECT week(DATE '2024-01-08') a,"
            " strrpos('ababab', 'ab') b, strrpos('abc', 'z') c,"
            " combine_hash(17, 99) d,"
            " great_circle_distance(36.12, -86.67, 33.94, -118.40) e,"
            " bitwise_shift_left(200, 1, 8) f,"
            " bitwise_logical_shift_right(200, 2, 8) g,"
            " split_to_multimap('a=1,a=2,b=3', ',', '=')['a'] h,"
            " inverse_binomial_cdf(20, 0.3, 0.5) i"
        )
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (2, 5, 0, 17 * 31 + 99)
    assert abs(row.e - ref_gcd(36.12, -86.67, 33.94, -118.40)) < 1e-9
    assert (row.f, row.g) == ((200 << 1) & 255, 200 >> 2)
    assert row.h == ["1", "2"]
    from presto_copy_spark.functions.stats import binomial_cdf

    assert binomial_cdf(20, 0.3, row.i) >= 0.5 > binomial_cdf(20, 0.3, row.i - 1)
    with pytest.raises(Exception, match="boom"):
        spark.sql("SELECT fail('boom')").collect()


def test_bing_tile_sql_family(spark):
    """Bing tile SQL surface vs the published tile-system example
    (Seattle 47.6097,-122.3331 -> tile (656,1430) quadkey 021230030220
    at level 12) and hand-computed quadkey bit interleaving."""
    row = spark.sql(
        "SELECT bing_tile_at(47.6097, -122.3331, 12) t,"
        " bing_tile_quadkey(bing_tile_at(47.6097, -122.3331, 12)) qk,"
        " bing_tile_quadkey(bing_tile(3, 5, 3)) qk2,"
        " bing_tile_parent(bing_tile(3, 5, 3)) par,"
        " bing_tile_children(bing_tile(1, 1, 3)) ch,"
        " size(bing_tiles_around(0.0, 0.0, 1)) na,"
        " bing_tile_coordinates(bing_tile(7, 9, 5)) co"
    ).collect()[0]
    assert (row.t.x, row.t.y, row.t.zoom) == (656, 1430, 12)
    assert row.qk == "021230030220"
    assert row.qk2 == "213"  # x=011,y=101 -> (0,1)(1,0)(1,1) -> 2,1,3
    assert (row.par.x, row.par.y, row.par.zoom) == (1, 2, 2)
    assert [(c.x, c.y, c.zoom) for c in row.ch] == [
        (2, 2, 4), (3, 2, 4), (2, 3, 4), (3, 3, 4)
    ]
    assert row.na == 4  # 2x2 world at zoom 1, out-of-range clipped
    assert (row.co.x, row.co.y) == (7, 9)
    # quadkey round-trips through parent: parent quadkey is the prefix
    pq = spark.sql(
        "SELECT bing_tile_quadkey(bing_tile_parent(bing_tile_at(47.6, -122.3, 12))) q"
    ).collect()[0].q
    assert row.qk.startswith(pq)


def test_ip_subnet_functions(spark):
    """IpPrefixFunctions.java ip_subnet_range/min/max + is_subnet_of
    over the string-modeled IPPREFIX/IPADDRESS types (v4 + v6)."""
    row = spark.sql(
        "SELECT ip_subnet_range('192.168.1.77/24') a,"
        " ip_subnet_min('10.0.0.0/8') b, ip_subnet_max('10.0.0.0/8') c,"
        " is_subnet_of('192.168.0.0/16', '192.168.44.3') d,"
        " is_subnet_of('192.168.0.0/16', '10.1.1.1') e,"
        " ip_subnet_range('2001:db8::/126') f"
    ).collect()[0]
    assert row.a == ["192.168.1.0", "192.168.1.255"]
    assert (row.b, row.c) == ("10.0.0.0", "10.255.255.255")
    assert (row.d, row.e) == (True, False)
    assert row.f == ["2001:db8::", "2001:db8::3"]


def test_ip_functions_property_vs_stdlib(spark):
    """The generated pure-Catalyst IPv4+IPv6 subnet macros (compat.py
    _ip_prefix_sql/_ip_subnet_bound_sql/_is_subnet_of_sql) agree with
    stdlib `ipaddress` on random addresses/prefix lengths of both
    families, including RFC 5952 '::' compression edges and mixed-family
    is_subnet_of (always false)."""
    import ipaddress
    import random

    rnd = random.Random(20260814)
    cases = []
    for _ in range(40):
        cases.append((str(ipaddress.IPv4Address(rnd.getrandbits(32))), rnd.randint(0, 32)))
    for _ in range(40):
        cases.append((str(ipaddress.IPv6Address(rnd.getrandbits(128))), rnd.randint(0, 128)))
    cases += [
        ("::", 0), ("::", 128), ("::1", 128), ("2001:db8::", 48),
        ("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff", 1),
        ("0.0.0.0", 0), ("255.255.255.255", 32),
        ("2001:0:0:1:0:0:0:1", 64), ("1:0:0:2:0:0:0:3", 128),
    ]
    probes = [str(ipaddress.IPv4Address(rnd.getrandbits(32))) for _ in range(3)]
    probes += [str(ipaddress.IPv6Address(rnd.getrandbits(128))) for _ in range(3)]

    df = spark.createDataFrame(
        [(ip, p, probes[i % len(probes)]) for i, (ip, p) in enumerate(cases)],
        "ip string, p int, probe string",
    )
    df.createOrReplaceTempView("_ip_prop_t")
    rows = spark.sql(
        """
        SELECT ip, p, probe,
               ip_prefix(ip, p) AS pfx,
               ip_subnet_min(concat(ip, '/', p)) AS mn,
               ip_subnet_max(concat(ip, '/', p)) AS mx,
               ip_subnet_range(concat(ip, '/', p)) AS rng,
               is_subnet_of(concat(ip, '/', p), ip) AS own,
               is_subnet_of(concat(ip, '/', p), probe) AS probed
        FROM _ip_prop_t
        """
    ).collect()
    for r in rows:
        net = ipaddress.ip_network(f"{r.ip}/{r.p}", strict=False)
        assert r.pfx == str(net), (r.ip, r.p, r.pfx)
        assert r.mn == str(net[0]), (r.ip, r.p, r.mn)
        assert r.mx == str(net[-1]), (r.ip, r.p, r.mx)
        assert r.rng == [str(net[0]), str(net[-1])]
        assert r.own is True
        probe = ipaddress.ip_address(r.probe)
        expected = probe.version == net.version and probe in net
        assert r.probed is expected, (r.ip, r.p, r.probe)


def test_spooky_hash_v2_reference_vectors(spark):
    """SpookyHash V2 against the reference's own published vectors
    (presto-main/.../TestVarbinaryFunctions.java:383-386), through the
    registered SQL names."""
    row = spark.sql(
        "SELECT hex(spooky_hash_v2_32(CAST('' AS BINARY))) a,"
        " hex(spooky_hash_v2_32(CAST('hello' AS BINARY))) b,"
        " hex(spooky_hash_v2_64(CAST('' AS BINARY))) c,"
        " hex(spooky_hash_v2_64(CAST('hello' AS BINARY))) d"
    ).collect()[0]
    assert row.a == "6BF50919"
    assert row.b == "D382E6CA"
    assert row.c == "232706FC6BF50919"
    assert row.d == "3768826AD382E6CA"
    # long-path (>= 192 bytes) determinism + distinctness sanity
    from presto_copy_spark.functions.spooky import spooky_hash128

    blob = bytes((i * 7 + 3) % 256 for i in range(500))
    assert spooky_hash128(blob) == spooky_hash128(blob)
    assert spooky_hash128(blob) != spooky_hash128(blob[:-1])


def test_empty_approx_set(spark):
    """HyperLogLogFunctions.java empty_approx_set(): estimate 0 and a
    correct union identity with a real sketch."""
    row = spark.sql(
        "SELECT hll_sketch_estimate(empty_approx_set()) e,"
        " hll_sketch_estimate(hll_union(empty_approx_set(),"
        "   (SELECT hll_sketch_agg(x) FROM (SELECT 7 AS x)))) m"
    ).collect()[0]
    assert row.e == 0 and row.m == 1

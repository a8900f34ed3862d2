"""Synthetic TPC-DS fixture tables for the reference's tpcds golden
queries (presto-product-tests/.../testcases/tpcds, 103 .sql files).

The container has no network (DuckDB's tpcds extension can't install)
and the driver fixtures are TPC-H-shaped, so the tpcds goldens run as
SPARK-vs-DUCKDB EQUIVALENCE checks on identical synthetic inputs: the
schema below is the public TPC-DS specification (table/column names and
types), the data is small seeded-deterministic rows whose value pools
match the spec's domains (d_year 1998-2002, cd_marital_status M/S/D/W/U,
hd_buy_potential '>10000'/'1001-5000'/..., i_category Books..Women) so
the queries' literal predicates actually select rows.

Everything is generated into parquet once per machine
(/tmp/spark_graft_tpcds) and registered as views in both engines —
byte-identical inputs, so result equivalence is exact.

Money columns are decimal(7,2) built from integer cents (no
float->decimal rounding ambiguity); both engines sum decimals exactly.
"""

from __future__ import annotations

import os
from decimal import Decimal

import numpy as np

CACHE = "/tmp/spark_graft_tpcds"

N_DATE0 = 2450815  # d_date_sk of 1998-01-01 (spec-ish julian base)

_CATEGORIES = [
    "Books", "Children", "Electronics", "Home", "Jewelry",
    "Men", "Music", "Shoes", "Sports", "Women",
]
_EDUCATION = [
    "Primary", "Secondary", "College", "2 yr Degree",
    "4 yr Degree", "Advanced Degree", "Unknown",
]
_MARITAL = ["M", "S", "D", "W", "U"]
_BUY_POTENTIAL = [">10000", "5001-10000", "1001-5000", "501-1000", "0-500", "Unknown"]
_CREDIT = ["Low Risk", "Good", "High Risk", "Unknown"]
_STATES = ["TN", "GA", "AL", "SC", "NC", "KY", "VA", "FL", "MS", "TX",
           "OH", "IN", "IL", "MI", "CA", "WA", "OR", "NY", "PA", "NJ"]
_CITIES = ["Midway", "Fairview", "Oak Grove", "Five Points", "Centerville",
           "Liberty", "Pleasant Hill", "Riverside", "Salem", "Union",
           "Spring Hill", "Greenfield", "Franklin", "Clinton", "Marion"]
_COUNTIES = ["Williamson County", "Walker County", "Daviess County",
             "Ziebach County", "Barrow County", "Fairfield County",
             "Luce County", "Richland County", "Bronx County", "Orange County"]
_STREET_TYPES = ["Street", "Ave", "Blvd", "Ct", "Dr", "Ln", "Pkwy", "Rd", "Way"]
_STREET_NAMES = ["Main", "Oak", "Park", "First", "Second", "Elm", "Maple",
                 "Cedar", "Pine", "Washington", "Lake", "Hill", "College",
                 "River", "Spring", "Church", "Mill", "Sunset", "Railroad",
                 "Jackson"]
_COLORS = ["almond", "antique", "aquamarine", "azure", "beige", "bisque",
           "black", "blanched", "blue", "blush", "brown", "burlywood",
           "burnished", "chartreuse", "chiffon", "chocolate", "coral",
           "cornflower", "cornsilk", "cream", "cyan", "dark", "deep", "dim",
           "dodger", "drab", "firebrick", "floral", "forest", "frosted",
           "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
           "hot", "indian", "ivory", "khaki", "lace", "lavender", "lawn",
           "lemon", "light", "lime", "linen", "magenta", "maroon", "medium",
           "metallic", "midnight", "mint", "misty", "moccasin", "navajo",
           "navy", "olive", "orange", "orchid", "pale", "papaya", "peach",
           "peru", "pink", "plum", "powder", "puff", "purple", "red", "rose",
           "rosy", "royal", "saddle", "salmon", "sandy", "seashell", "sienna",
           "sky", "slate", "smoke", "snow", "spring", "steel", "tan",
           "thistle", "tomato", "turquoise", "violet", "wheat", "white",
           "yellow"]
_SIZES = ["small", "medium", "large", "extra large", "economy", "N/A", "petite"]
_UNITS = ["Each", "Dozen", "Case", "Pallet", "Gross", "Box", "Bunch", "Carton"]
_FIRST = ["James", "Mary", "John", "Patricia", "Robert", "Jennifer",
          "Michael", "Linda", "William", "Elizabeth", "David", "Barbara",
          "Richard", "Susan", "Joseph", "Jessica", "Thomas", "Sarah",
          "Charles", "Karen"]
_LAST = ["Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
         "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez",
         "Gonzalez", "Wilson", "Anderson", "Thomas", "Taylor", "Moore",
         "Jackson", "Martin"]
_COUNTRIES = ["UNITED STATES", "CANADA", "MEXICO", "GERMANY", "FRANCE",
              "JAPAN", "CHINA", "BRAZIL", "INDIA", "AUSTRALIA"]
_MEALS = ["breakfast", "dinner", None]
_SM_TYPES = ["EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY", "LIBRARY"]
_SM_CARRIERS = ["UPS", "FEDEX", "AIRBORNE", "USPS", "DHL", "TBS", "ZHOU",
                "LATVIAN", "DIAMOND", "BARIAN"]
_STORE_NAMES = ["ought", "able", "pri", "ese", "anti", "cally", "ation",
                "eing", "bar", "ought2"]


def _dec(rng, n, lo, hi, frac_null=0.0):
    """decimal(7,2) column from integer cents (exact in both engines)."""
    cents = rng.integers(int(lo * 100), int(hi * 100), n)
    vals = [Decimal(int(c)) / 100 for c in cents]
    if frac_null:
        mask = rng.random(n) < frac_null
        vals = [None if m else v for v, m in zip(vals, mask)]
    return vals


def _pick(rng, pool, n, frac_null=0.0):
    idx = rng.integers(0, len(pool), n)
    vals = [pool[i] for i in idx]
    if frac_null:
        mask = rng.random(n) < frac_null
        vals = [None if m else v for v, m in zip(vals, mask)]
    return vals


def _ints(rng, n, lo, hi, frac_null=0.0):
    vals = rng.integers(lo, hi, n).tolist()
    if frac_null:
        mask = rng.random(n) < frac_null
        vals = [None if m else v for v, m in zip(vals, mask)]
    return vals


def _build_tables() -> dict[str, "pa.Table"]:  # noqa: F821
    import datetime as dt

    import pyarrow as pa

    t: dict[str, pa.Table] = {}
    dec = pa.decimal128(7, 2)

    # ---- date_dim: one row per day 1998-01-01 .. 2002-12-31 ----------
    days = []
    d0 = dt.date(1998, 1, 1)
    while d0 <= dt.date(2002, 12, 31):
        days.append(d0)
        d0 += dt.timedelta(days=1)
    n = len(days)
    day_names = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
                 "Saturday", "Sunday"]
    t["date_dim"] = pa.table(
        {
            "d_date_sk": pa.array([N_DATE0 + i for i in range(n)], pa.int64()),
            "d_date_id": [f"AAAAAAAA{N_DATE0 + i}" for i in range(n)],
            "d_date": pa.array(days, pa.date32()),
            "d_year": [d.year for d in days],
            "d_moy": [d.month for d in days],
            "d_dom": [d.day for d in days],
            "d_dow": [d.weekday() for d in days],
            "d_qoy": [(d.month - 1) // 3 + 1 for d in days],
            "d_day_name": [day_names[d.weekday()] for d in days],
            "d_quarter_name": [f"{d.year}Q{(d.month - 1) // 3 + 1}" for d in days],
            # spec: d_month_seq counts months since 1900-01
            "d_month_seq": [(d.year - 1900) * 12 + d.month - 1 for d in days],
            "d_week_seq": [(N_DATE0 + i - 5) // 7 for i, d in enumerate(days)],
        }
    )

    # ---- time_dim: one row per minute ---------------------------------
    rng = np.random.default_rng(101)
    mins = list(range(0, 86400, 60))
    t["time_dim"] = pa.table(
        {
            "t_time_sk": pa.array(mins, pa.int64()),
            "t_time": mins,
            "t_hour": [m // 3600 for m in mins],
            "t_minute": [(m % 3600) // 60 for m in mins],
            "t_am_pm": ["AM" if m < 43200 else "PM" for m in mins],
            "t_meal_time": _pick(rng, _MEALS, len(mins)),
        }
    )

    # ---- item ---------------------------------------------------------
    rng = np.random.default_rng(102)
    n = 1000
    cat_idx = rng.integers(0, len(_CATEGORIES), n)
    t["item"] = pa.table(
        {
            "i_item_sk": pa.array(range(1, n + 1), pa.int64()),
            "i_item_id": [f"AAAAAAAA{i:08d}" for i in rng.integers(1, n // 2, n)],
            "i_item_desc": [f"desc {i}" for i in rng.integers(1, 500, n)],
            "i_category": [_CATEGORIES[i] for i in cat_idx],
            "i_category_id": [int(i) + 1 for i in cat_idx],
            "i_class": [f"class{int(i):02d}" for i in rng.integers(1, 17, n)],
            "i_class_id": _ints(rng, n, 1, 17),
            "i_brand_id": [int(b) for b in rng.integers(1001001, 1005002, n)],
            "i_brand": [f"Brand#{int(b) % 100}" for b in rng.integers(0, 100, n)],
            "i_manufact_id": _ints(rng, n, 1, 101),
            "i_manufact": [f"manufact{int(i):03d}" for i in rng.integers(1, 101, n)],
            "i_manager_id": _ints(rng, n, 1, 101),
            "i_product_name": [f"product{i}" for i in range(1, n + 1)],
            "i_current_price": pa.array(_dec(rng, n, 0.5, 100), dec),
            "i_wholesale_cost": pa.array(_dec(rng, n, 0.3, 80), dec),
            "i_color": _pick(rng, _COLORS, n),
            "i_size": _pick(rng, _SIZES, n),
            "i_units": _pick(rng, _UNITS, n),
        }
    )

    # ---- customer_address --------------------------------------------
    rng = np.random.default_rng(103)
    n = 1000
    t["customer_address"] = pa.table(
        {
            "ca_address_sk": pa.array(range(1, n + 1), pa.int64()),
            "ca_address_id": [f"AAAAAAAA{i:08d}" for i in range(1, n + 1)],
            "ca_street_number": [str(int(i)) for i in rng.integers(1, 1000, n)],
            "ca_street_name": _pick(rng, _STREET_NAMES, n),
            "ca_street_type": _pick(rng, _STREET_TYPES, n),
            "ca_suite_number": [f"Suite {int(i)}" for i in rng.integers(0, 300, n)],
            "ca_city": _pick(rng, _CITIES, n),
            "ca_county": _pick(rng, _COUNTIES, n),
            "ca_state": _pick(rng, _STATES, n),
            "ca_zip": [f"{int(z):05d}" for z in rng.integers(10000, 99999, n)],
            "ca_country": ["United States"] * n,
            "ca_gmt_offset": pa.array(
                [Decimal(int(v)) for v in rng.choice([-5, -6, -7, -8], n)], dec
            ),
            "ca_location_type": _pick(
                rng, ["apartment", "condo", "single family"], n
            ),
        }
    )

    # ---- customer_demographics ---------------------------------------
    rng = np.random.default_rng(104)
    n = 2000
    t["customer_demographics"] = pa.table(
        {
            "cd_demo_sk": pa.array(range(1, n + 1), pa.int64()),
            "cd_gender": _pick(rng, ["M", "F"], n),
            "cd_marital_status": _pick(rng, _MARITAL, n),
            "cd_education_status": _pick(rng, _EDUCATION, n),
            "cd_purchase_estimate": [int(v) * 500 for v in rng.integers(1, 21, n)],
            "cd_credit_rating": _pick(rng, _CREDIT, n),
            "cd_dep_count": _ints(rng, n, 0, 7),
            "cd_dep_employed_count": _ints(rng, n, 0, 7),
            "cd_dep_college_count": _ints(rng, n, 0, 7),
        }
    )

    # ---- household_demographics / income_band ------------------------
    rng = np.random.default_rng(105)
    n = 720
    t["household_demographics"] = pa.table(
        {
            "hd_demo_sk": pa.array(range(1, n + 1), pa.int64()),
            "hd_income_band_sk": pa.array(_ints(rng, n, 1, 21), pa.int64()),
            "hd_buy_potential": _pick(rng, _BUY_POTENTIAL, n),
            "hd_dep_count": _ints(rng, n, 0, 10),
            "hd_vehicle_count": _ints(rng, n, -1, 5),
        }
    )
    t["income_band"] = pa.table(
        {
            "ib_income_band_sk": pa.array(range(1, 21), pa.int64()),
            "ib_lower_bound": [i * 10000 for i in range(20)],
            "ib_upper_bound": [(i + 1) * 10000 for i in range(20)],
        }
    )

    # ---- customer -----------------------------------------------------
    rng = np.random.default_rng(106)
    n = 2000
    t["customer"] = pa.table(
        {
            "c_customer_sk": pa.array(range(1, n + 1), pa.int64()),
            "c_customer_id": [f"AAAAAAAA{i:08d}" for i in range(1, n + 1)],
            "c_current_addr_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "c_current_cdemo_sk": pa.array(
                _ints(rng, n, 1, 2001, frac_null=0.03), pa.int64()
            ),
            "c_current_hdemo_sk": pa.array(
                _ints(rng, n, 1, 721, frac_null=0.03), pa.int64()
            ),
            "c_first_name": _pick(rng, _FIRST, n, frac_null=0.02),
            "c_last_name": _pick(rng, _LAST, n, frac_null=0.02),
            "c_salutation": _pick(
                rng, ["Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"], n
            ),
            "c_preferred_cust_flag": _pick(rng, ["Y", "N"], n, frac_null=0.02),
            "c_birth_day": _ints(rng, n, 1, 29),
            "c_birth_month": _ints(rng, n, 1, 13),
            "c_birth_year": _ints(rng, n, 1924, 1993),
            "c_birth_country": _pick(rng, _COUNTRIES, n),
            "c_login": [None] * n,
            "c_email_address": [f"c{i}@example.org" for i in range(1, n + 1)],
            "c_first_sales_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "c_first_shipto_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "c_last_review_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
        }
    )

    # ---- store --------------------------------------------------------
    rng = np.random.default_rng(107)
    n = 20
    t["store"] = pa.table(
        {
            "s_store_sk": pa.array(range(1, n + 1), pa.int64()),
            "s_store_id": [f"AAAAAAAA{i:08d}" for i in range(1, n + 1)],
            "s_store_name": _pick(rng, _STORE_NAMES, n),
            "s_number_employees": _ints(rng, n, 200, 301),
            "s_floor_space": _ints(rng, n, 5000000, 10000001),
            "s_market_id": _ints(rng, n, 1, 11),
            "s_company_id": [1] * n,
            "s_company_name": ["Unknown"] * n,
            "s_street_number": [str(int(i)) for i in rng.integers(1, 1000, n)],
            "s_street_name": _pick(rng, _STREET_NAMES, n),
            "s_street_type": _pick(rng, _STREET_TYPES, n),
            "s_suite_number": [f"Suite {int(i)}" for i in rng.integers(0, 300, n)],
            "s_city": _pick(rng, _CITIES, n),
            "s_county": _pick(rng, _COUNTIES, n),
            "s_state": _pick(rng, _STATES[:6], n),
            "s_zip": [f"{int(z):05d}" for z in rng.integers(10000, 99999, n)],
            "s_gmt_offset": pa.array(
                [Decimal(int(v)) for v in rng.choice([-5, -6], n)], dec
            ),
        }
    )

    # ---- small dims ---------------------------------------------------
    rng = np.random.default_rng(108)
    t["warehouse"] = pa.table(
        {
            "w_warehouse_sk": pa.array(range(1, 6), pa.int64()),
            "w_warehouse_name": [f"Warehouse {i}" for i in range(1, 6)],
            "w_warehouse_sq_ft": _ints(rng, 5, 50000, 1000000),
            "w_city": _pick(rng, _CITIES, 5),
            "w_county": _pick(rng, _COUNTIES, 5),
            "w_state": _pick(rng, _STATES[:6], 5),
            "w_country": ["United States"] * 5,
        }
    )
    t["ship_mode"] = pa.table(
        {
            "sm_ship_mode_sk": pa.array(range(1, 21), pa.int64()),
            "sm_type": [_SM_TYPES[i % 6] for i in range(20)],
            "sm_carrier": [_SM_CARRIERS[i % 10] for i in range(20)],
        }
    )
    t["reason"] = pa.table(
        {
            "r_reason_sk": pa.array(range(1, 36), pa.int64()),
            "r_reason_desc": [f"reason {i}" for i in range(1, 36)],
        }
    )
    t["promotion"] = pa.table(
        {
            "p_promo_sk": pa.array(range(1, 101), pa.int64()),
            "p_promo_id": [f"AAAAAAAA{i:08d}" for i in range(1, 101)],
            "p_channel_dmail": _pick(rng, ["Y", "N"], 100),
            "p_channel_email": _pick(rng, ["Y", "N"], 100),
            "p_channel_event": _pick(rng, ["Y", "N"], 100),
            "p_channel_tv": _pick(rng, ["Y", "N"], 100),
        }
    )
    t["web_site"] = pa.table(
        {
            "web_site_sk": pa.array(range(1, 11), pa.int64()),
            "web_site_id": [f"AAAAAAAA{i:08d}" for i in range(1, 11)],
            "web_name": [f"site_{i}" for i in range(1, 11)],
            "web_company_name": [["pri", "able", "ought", "ese", "anti"][i % 5] for i in range(10)],
        }
    )
    t["web_page"] = pa.table(
        {
            "wp_web_page_sk": pa.array(range(1, 61), pa.int64()),
            "wp_char_count": _ints(rng, 60, 100, 8001),
        }
    )
    t["call_center"] = pa.table(
        {
            "cc_call_center_sk": pa.array(range(1, 7), pa.int64()),
            "cc_call_center_id": [f"AAAAAAAA{i:08d}" for i in range(1, 7)],
            "cc_name": [f"call center {i}" for i in range(1, 7)],
            "cc_manager": _pick(rng, [f"{f} {l}" for f, l in zip(_FIRST, _LAST)], 6),
            "cc_county": _pick(rng, _COUNTIES, 6),
        }
    )
    t["catalog_page"] = pa.table(
        {
            "cp_catalog_page_sk": pa.array(range(1, 101), pa.int64()),
            "cp_catalog_page_id": [f"AAAAAAAA{i:08d}" for i in range(1, 101)],
        }
    )

    # ---- inventory ----------------------------------------------------
    rng = np.random.default_rng(109)
    n = 20000
    t["inventory"] = pa.table(
        {
            "inv_date_sk": pa.array(_ints(rng, n, N_DATE0, N_DATE0 + 1826), pa.int64()),
            "inv_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "inv_warehouse_sk": pa.array(_ints(rng, n, 1, 6), pa.int64()),
            "inv_quantity_on_hand": _ints(rng, n, 0, 1000, frac_null=0.02),
        }
    )

    # ---- facts --------------------------------------------------------
    def money(n_, lo=1, hi=300, frac_null=0.01):
        return pa.array(_dec(rng, n_, lo, hi, frac_null), dec)

    time_sks = mins

    rng = np.random.default_rng(110)
    n = 60000
    t["store_sales"] = pa.table(
        {
            "ss_sold_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "ss_sold_time_sk": pa.array(
                [time_sks[i] for i in rng.integers(0, len(time_sks), n)], pa.int64()
            ),
            "ss_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "ss_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "ss_cdemo_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "ss_hdemo_sk": pa.array(_ints(rng, n, 1, 721, frac_null=0.02), pa.int64()),
            "ss_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "ss_store_sk": pa.array(_ints(rng, n, 1, 21, frac_null=0.02), pa.int64()),
            "ss_promo_sk": pa.array(_ints(rng, n, 1, 101, frac_null=0.02), pa.int64()),
            "ss_ticket_number": pa.array([1 + i // 3 for i in range(n)], pa.int64()),
            "ss_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "ss_wholesale_cost": money(n, 1, 100),
            "ss_list_price": money(n, 1, 200),
            "ss_sales_price": money(n, 0, 200),
            "ss_ext_discount_amt": money(n, 0, 1000),
            "ss_ext_sales_price": money(n, 0, 2000),
            "ss_ext_wholesale_cost": money(n, 1, 2000),
            "ss_ext_list_price": money(n, 1, 4000),
            "ss_ext_tax": money(n, 0, 200),
            "ss_coupon_amt": money(n, 0, 500),
            "ss_net_paid": money(n, 0, 2000),
            "ss_net_paid_inc_tax": money(n, 0, 2200),
            "ss_net_profit": money(n, -500, 1500),
        }
    )

    rng = np.random.default_rng(111)
    n = 6000
    t["store_returns"] = pa.table(
        {
            "sr_returned_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "sr_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "sr_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "sr_cdemo_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "sr_store_sk": pa.array(_ints(rng, n, 1, 21, frac_null=0.02), pa.int64()),
            "sr_reason_sk": pa.array(_ints(rng, n, 1, 36, frac_null=0.02), pa.int64()),
            "sr_ticket_number": pa.array(_ints(rng, n, 1, 20001), pa.int64()),
            "sr_return_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "sr_return_amt": money(n, 0, 2000),
            "sr_net_loss": money(n, 0, 1000),
        }
    )

    rng = np.random.default_rng(112)
    n = 30000
    t["catalog_sales"] = pa.table(
        {
            "cs_sold_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "cs_sold_time_sk": pa.array(
                [time_sks[i] for i in rng.integers(0, len(time_sks), n)], pa.int64()
            ),
            "cs_ship_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1856, frac_null=0.02), pa.int64()
            ),
            "cs_bill_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "cs_bill_cdemo_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "cs_bill_hdemo_sk": pa.array(_ints(rng, n, 1, 721, frac_null=0.02), pa.int64()),
            "cs_bill_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "cs_ship_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "cs_ship_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "cs_call_center_sk": pa.array(_ints(rng, n, 1, 7, frac_null=0.02), pa.int64()),
            "cs_catalog_page_sk": pa.array(_ints(rng, n, 1, 101, frac_null=0.02), pa.int64()),
            "cs_ship_mode_sk": pa.array(_ints(rng, n, 1, 21, frac_null=0.02), pa.int64()),
            "cs_warehouse_sk": pa.array(_ints(rng, n, 1, 6, frac_null=0.02), pa.int64()),
            "cs_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "cs_promo_sk": pa.array(_ints(rng, n, 1, 101, frac_null=0.02), pa.int64()),
            "cs_order_number": pa.array([1 + i // 2 for i in range(n)], pa.int64()),
            "cs_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "cs_wholesale_cost": money(n, 1, 100),
            "cs_list_price": money(n, 1, 300),
            "cs_sales_price": money(n, 0, 300),
            "cs_ext_discount_amt": money(n, 0, 1000),
            "cs_ext_sales_price": money(n, 0, 2000),
            "cs_ext_wholesale_cost": money(n, 1, 2000),
            "cs_ext_list_price": money(n, 1, 4000),
            "cs_ext_ship_cost": money(n, 0, 1000),
            "cs_coupon_amt": money(n, 0, 500),
            "cs_net_paid": money(n, 0, 2000),
            "cs_net_paid_inc_tax": money(n, 0, 2200),
            "cs_net_profit": money(n, -500, 1500),
        }
    )

    rng = np.random.default_rng(113)
    n = 3000
    t["catalog_returns"] = pa.table(
        {
            "cr_returned_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "cr_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "cr_order_number": pa.array(_ints(rng, n, 1, 15001), pa.int64()),
            "cr_returning_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "cr_returning_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "cr_call_center_sk": pa.array(_ints(rng, n, 1, 7, frac_null=0.02), pa.int64()),
            "cr_catalog_page_sk": pa.array(_ints(rng, n, 1, 101, frac_null=0.02), pa.int64()),
            "cr_reason_sk": pa.array(_ints(rng, n, 1, 36, frac_null=0.02), pa.int64()),
            "cr_return_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "cr_return_amount": money(n, 0, 2000),
            "cr_return_amt_inc_tax": money(n, 0, 2200),
            "cr_refunded_cash": money(n, 0, 1000),
            "cr_reversed_charge": money(n, 0, 1000),
            "cr_store_credit": money(n, 0, 1000),
            "cr_net_loss": money(n, 0, 1000),
        }
    )

    rng = np.random.default_rng(114)
    n = 20000
    t["web_sales"] = pa.table(
        {
            "ws_sold_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "ws_sold_time_sk": pa.array(
                [time_sks[i] for i in rng.integers(0, len(time_sks), n)], pa.int64()
            ),
            "ws_ship_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1856, frac_null=0.02), pa.int64()
            ),
            "ws_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "ws_bill_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "ws_bill_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "ws_ship_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "ws_ship_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "ws_ship_hdemo_sk": pa.array(_ints(rng, n, 1, 721, frac_null=0.02), pa.int64()),
            "ws_web_page_sk": pa.array(_ints(rng, n, 1, 61, frac_null=0.02), pa.int64()),
            "ws_web_site_sk": pa.array(_ints(rng, n, 1, 11, frac_null=0.02), pa.int64()),
            "ws_ship_mode_sk": pa.array(_ints(rng, n, 1, 21, frac_null=0.02), pa.int64()),
            "ws_warehouse_sk": pa.array(_ints(rng, n, 1, 6, frac_null=0.02), pa.int64()),
            "ws_promo_sk": pa.array(_ints(rng, n, 1, 101, frac_null=0.02), pa.int64()),
            "ws_order_number": pa.array([1 + i // 2 for i in range(n)], pa.int64()),
            "ws_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "ws_wholesale_cost": money(n, 1, 100),
            "ws_list_price": money(n, 1, 300),
            "ws_sales_price": money(n, 0, 300),
            "ws_ext_discount_amt": money(n, 0, 1000),
            "ws_ext_sales_price": money(n, 0, 2000),
            "ws_ext_wholesale_cost": money(n, 1, 2000),
            "ws_ext_list_price": money(n, 1, 4000),
            "ws_ext_ship_cost": money(n, 0, 1000),
            "ws_net_paid": money(n, 0, 2000),
            "ws_net_profit": money(n, -500, 1500),
        }
    )

    rng = np.random.default_rng(115)
    n = 2000
    t["web_returns"] = pa.table(
        {
            "wr_returned_date_sk": pa.array(
                _ints(rng, n, N_DATE0, N_DATE0 + 1826, frac_null=0.02), pa.int64()
            ),
            "wr_item_sk": pa.array(_ints(rng, n, 1, 1001), pa.int64()),
            "wr_order_number": pa.array(_ints(rng, n, 1, 10001), pa.int64()),
            "wr_returning_customer_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "wr_returning_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "wr_returning_cdemo_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "wr_refunded_addr_sk": pa.array(_ints(rng, n, 1, 1001, frac_null=0.02), pa.int64()),
            "wr_refunded_cdemo_sk": pa.array(_ints(rng, n, 1, 2001, frac_null=0.02), pa.int64()),
            "wr_reason_sk": pa.array(_ints(rng, n, 1, 36, frac_null=0.02), pa.int64()),
            "wr_web_page_sk": pa.array(_ints(rng, n, 1, 61, frac_null=0.02), pa.int64()),
            "wr_return_quantity": _ints(rng, n, 1, 101, frac_null=0.01),
            "wr_return_amt": money(n, 0, 2000),
            "wr_refunded_cash": money(n, 0, 1000),
            "wr_fee": money(n, 0, 100),
            "wr_net_loss": money(n, 0, 1000),
        }
    )

    return t


TPCDS_TABLES = [
    "date_dim", "time_dim", "item", "customer", "customer_address",
    "customer_demographics", "household_demographics", "income_band",
    "store", "warehouse", "ship_mode", "reason", "promotion", "web_site",
    "web_page", "call_center", "catalog_page", "inventory", "store_sales",
    "store_returns", "catalog_sales", "catalog_returns", "web_sales",
    "web_returns",
]


def ensure_parquet() -> str:
    """Generate (once) and return the parquet cache directory."""
    import pyarrow.parquet as pq

    marker = os.path.join(CACHE, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(CACHE, exist_ok=True)
        for name, table in _build_tables().items():
            pq.write_table(table, os.path.join(CACHE, f"{name}.parquet"))
        open(marker, "w").close()
    return CACHE


def register_spark(spark) -> None:
    d = ensure_parquet()
    for name in TPCDS_TABLES:
        spark.read.parquet(os.path.join(d, f"{name}.parquet")).createOrReplaceTempView(
            name
        )


def register_duckdb(con) -> None:
    d = ensure_parquet()
    for name in TPCDS_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{os.path.join(d, name + '.parquet')}'"
        )

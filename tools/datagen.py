"""Seeded generator for the reference's six input formats (FIXTURES.md).

Produces CSV files with the exact schemas the reference jobs consume, at any
row scale, with every distribution property the fixtures document requires:
- ascending timestamps where assignAscendingTimestamps is used; bounded
  disorder for apache_log (≤1 s) and login_log (≤3 s);
- hot keys (skewed item popularity, one blacklist-crossing (user, ad) pair);
- the detection cases: consecutive fails ≤2 s, fail→success→fail resets,
  create-only orders, late pays, pay-without-create, unmatched receipts;
- empty-string txId sentinels on create rows; no headers, no quoting.

Usage:
    python tools/datagen.py OUT_DIR [scale]   # scale ~ rows multiplier, default 1

Deterministic under a fixed seed: same args → byte-identical files.
"""

from __future__ import annotations

import os
import random
import sys

SEED = 42
T0 = 1700000000  # epoch base for generated days


def gen_user_behavior(rng: random.Random, n: int) -> list[str]:
    # skewed item popularity: Zipf-ish over 1000 items, hot head
    rows = []
    ts = T0
    for i in range(n):
        ts += rng.randint(0, 3)
        user = rng.randint(1, max(n // 10, 10))
        item = int(1000 / (rng.randint(1, 1000) ** 0.7))  # skew
        cat = item % 50
        behavior = rng.choices(
            ["pv", "buy", "cart", "fav"], weights=[85, 5, 5, 5]
        )[0]
        rows.append(f"{user},{item},{cat},{behavior},{ts}")
    return rows


def gen_apache_log(rng: random.Random, n: int) -> list[str]:
    import datetime as dt

    urls = [f"/page/{i}" for i in range(50)] + [
        "/style.css", "/app.js", "/favicon.ico", "/favicon.ico", "/favicon.ico"
    ]
    base = dt.datetime(2015, 5, 17, 10, 0, 0)
    rows = []
    for i in range(n):
        t = base + dt.timedelta(seconds=i // 2 + rng.randint(-1, 1))  # ≤1 s ooo
        ip = f"{rng.randint(1,254)}.{rng.randint(0,254)}.9.{rng.randint(1,254)}"
        url = rng.choice(urls)
        method = rng.choices(["GET", "HEAD", "POST"], weights=[97, 2, 1])[0]
        rows.append(
            f"{ip} - - {t.strftime('%d/%m/%Y:%H:%M:%S')} +0000 {method} {url}"
        )
    return rows


def gen_ad_click_log(rng: random.Random, n: int) -> list[str]:
    provinces = {
        "beijing": ["beijing"],
        "guangdong": ["guangzhou", "shenzhen"],
        "zhejiang": ["hangzhou"],
        "jiangsu": ["nanjing"],
    }
    rows = []
    ts = T0
    hot_user, hot_ad = 937166, 1715  # crosses the 50/day blacklist threshold
    for i in range(n):
        ts += rng.randint(0, 30)
        if rng.random() < 0.45:  # hot pair dominates, like the shipped file
            user, ad, prov = hot_user, hot_ad, "beijing"
        else:
            user = rng.randint(1, 20)
            ad = rng.randint(1, 10)
            prov = rng.choice(list(provinces))
        city = rng.choice(provinces[prov])
        rows.append(f"{user},{ad},{prov},{city},{ts}")
    return rows


def gen_login_log(rng: random.Random, n: int) -> list[str]:
    rows = []
    ts = T0
    # guaranteed cases: consecutive fails ≤2 s; fail→success→fail reset
    rows.append(f"1035,92.1.2.3,fail,{ts}")
    rows.append(f"1035,92.1.2.3,fail,{ts + 1}")
    rows.append(f"2044,92.1.2.4,fail,{ts + 2}")
    rows.append(f"2044,92.1.2.4,success,{ts + 3}")
    rows.append(f"2044,92.1.2.4,fail,{ts + 4}")
    for i in range(n - 5):
        ts += rng.randint(1, 5)
        user = rng.randint(1, max(n // 5, 10))
        status = rng.choices(["success", "fail"], weights=[80, 20])[0]
        jitter = rng.randint(-3, 0)  # ≤3 s bounded disorder
        rows.append(f"{user},10.0.0.{user % 255},{status},{ts + jitter}")
    return rows


def gen_order_and_receipts(
    rng: random.Random, n_orders: int
) -> tuple[list[str], list[str]]:
    orders, receipts = [], []
    ts = T0
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    for oid in range(1, n_orders + 1):
        ts += rng.randint(1, 20)
        tx = "".join(rng.choice(alnum) for _ in range(9))
        kind = rng.random()
        orders.append(f"{oid},create,,{ts}")
        if kind < 0.80:  # paid in time
            pay_ts = ts + rng.randint(0, 890)
            orders.append(f"{oid},pay,{tx},{pay_ts}")
            if rng.random() < 0.9:  # most pays get receipts near the pay
                receipts.append(f"{tx},wechat,{pay_ts + rng.randint(-15, 20)}")
        elif kind < 0.90:  # late pay ("payed but already timeout")
            orders.append(f"{oid},pay,{tx},{ts + rng.randint(1000, 4000)}")
        # else: create-only → timeout
    # pay without create + unmatched receipt
    orders.append(f"{n_orders + 1},pay,orphanpay1,{ts + 100}")
    receipts.append(f"lonereceip,alipay,{ts + 50}")
    orders.sort(key=lambda r: int(r.rsplit(",", 1)[1]))
    receipts.sort(key=lambda r: int(r.rsplit(",", 1)[1]))
    return orders, receipts


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "generated_fixtures"
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    rng = random.Random(SEED)
    os.makedirs(out_dir, exist_ok=True)
    files = {
        "UserBehavior.csv": gen_user_behavior(rng, int(10000 * scale)),
        "apache.log": gen_apache_log(rng, int(10000 * scale)),
        "AdClickLog.csv": gen_ad_click_log(rng, int(500 * scale)),
        "LoginLog.csv": gen_login_log(rng, int(500 * scale)),
    }
    orders, receipts = gen_order_and_receipts(rng, int(200 * scale))
    files["OrderLog.csv"] = orders
    files["ReceiptLog.csv"] = receipts
    for name, rows in files.items():
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
        print(f"{path}: {len(rows)} rows")


if __name__ == "__main__":
    main()

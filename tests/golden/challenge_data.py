"""Reconstructed p3/p4 challenge data satisfying every staged golden.

The reference pins seven outcomes of the canonical query

    SELECT trunc-avg(t.td), trunc-avg(u.uc)
    FROM t JOIN u ON t.ta = u.ua
    WHERE t.tb = 1000 AND u.ud BETWEEN 9000 AND 9000000

across the p4 mutation stages (p4challenge/individual/p4c-*.expected):

    S1 initial                                   (575250, 498194)
    S2 +5 inserts (one with tb=1000, ta=234231)  (536077, 507767)
    S3 delete t where td in [0, 99999]           (618527, 499023)
    S4 update u.uc=10000 where ub >= 500001      (618527, 238469)
    S5 delete u where ua in [100000, 200000]     (618527, 238469)
    S6 update t.ta=54321 where tc in [10000,2e5] (593609, 244244)

Construction: five join groups, each ONE t row matching m u rows, so a
group contributes (td * m) to the td-sum and its uc-sum to the uc-sum,
with m pairs of weight. Lifecycles:

    key 777  "P"  m=70  survives everything          td=600000  tc<1e4
    key 888  "U4" m=10  uc := 10000 at S4 (ub高)     td=548877  tc<1e4
    key 999  "D6" m=5   leaves at S6 (tc=50000)      td=1017210
    key 555  "D3" m=7   t row dies at S3 (td=49740)
    key 234231 "B" m=7  matched only during S2 by the scripted insert
                        (its t row has td=21234, deleted again at S3)

Solving the twelve floor((sum)/(weight)) constraints gives the exact
sums below; chaff rows cover the S5 delete range (ua in [100k,200k],
never joined) and non-selected tb values. Verified against DuckDB
applying the same staged mutations (see test_mutations_p4_shape for the
generic differential version).
"""

T_HEADER = ["ta", "tb", "tc", "td"]
U_HEADER = ["ua", "ub", "uc", "ud"]

T_ROWS = [
    (777, 1000, 5, 600000),
    (888, 1000, 7, 548877),
    (999, 1000, 50000, 1017210),
    (555, 1000, 8, 49740),
    # chaff: tb != 1000, never selected; exercises mutation sweeps
    (101, 42, 3, 123456),
    (102, 77, 20000, 555),
]

U_ROWS = (
    [(777, 100, 277707, 10000)] * 69 + [(777, 100, 277737, 10000)]
    + [(888, 600000, 2224709, 10000)] * 10
    + [(999, 100, 146069, 10000)] * 5
    + [(555, 100, 488127, 10000)] * 6 + [(555, 100, 488131, 10000)]
    + [(234231, 100, 633583, 10000)] * 6 + [(234231, 100, 633587, 10000)]
    # chaff: deleted by S5 (ua in range); one joins nothing by ud, one by ua
    + [(150000, 100, 1, 5), (150001, 100, 1, 10000)]
)


def write_csvs(dirpath) -> tuple[str, str]:
    import os

    t_csv = os.path.join(str(dirpath), "t.csv")
    u_csv = os.path.join(str(dirpath), "u.csv")
    for path, header, rows in ((t_csv, T_HEADER, T_ROWS), (u_csv, U_HEADER, U_ROWS)):
        with open(path, "w") as f:
            f.write(",".join(header) + "\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")
    return t_csv, u_csv

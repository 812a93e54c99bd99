from __future__ import annotations

from neural_search_spark.functions.pii import scrub_pii


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (0, "contact me at john.doe+spam@example.co.uk or admin@test.io thanks"),
        (1, "server at 192.168.1.254 and 10.0.0.1 maybe"),
        (2, "call +1 (555) 123-4567 or 555-867-5309 now"),
        (3, "no pii here at all"),
        (4, "mixed: bob@x.org from 10.1.2.3 call 555-0100"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert out[0]["clean_text"] == "contact me at <EMAIL> or <EMAIL> thanks"
    assert out[0]["n_emails"] == 2 and out[0]["n_phones"] == 0
    assert out[1]["clean_text"] == "server at <IP> and <IP> maybe"
    assert out[1]["n_ips"] == 2
    # IPs are phone-shaped digit runs: counting AFTER redaction avoids
    # double-reporting them as phones
    assert out[1]["n_phones"] == 0
    assert out[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert out[2]["n_phones"] == 2
    assert out[3]["clean_text"] == rows[3][1]
    assert (out[4]["n_emails"], out[4]["n_ips"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["clean_text"] == "mixed: <EMAIL> from <IP> call <PHONE>"


def test_scrub_pii_stays_jvm_side(spark):
    df = spark.createDataFrame([(0, "x@y.io")], "doc_id long, text string")
    plan = scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan

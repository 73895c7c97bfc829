"""Lab3 + lab4 walkthrough chains end-to-end through ``run_sql_script``.

The reference's authoritative test corpus is walkthrough SQL extracted by
regex and executed as one chain per lab against Flink
(/root/reference/testing/e2e/test_lab3.py:38-90, test_lab4.py:213-364,
scripts/common/sql_extractors.py:283-303). These tests run the same chains
— tumble agg → ML_DETECT_ANOMALIES OVER → post-filter → interval
join/LIMIT → lateral embed → VECTOR_SEARCH_AGG → lateral LLM →
AI_RUN_AGENT → REGEXP_EXTRACT into typed columns — as ONE script each, in
the walkthroughs' own spelling, and assert the reference's semantic
contracts:

- lab3: ≤2 anomalies and only French Quarter surges
  (test_lab3.py:248-257); anomalies_enriched has populated chunk/reason
  columns (test_lab3.py:282-296); completed_actions' dispatch_summary
  carries no failure marker (test_lab3.py:339).
- lab4: ≤2 anomalies and only Naples spikes (test_lab4.py:241-272);
  claims_reviewed verdicts come from the five-value set
  (test_lab4.py:37-43,357-364).

The data-plane analog of the labs' Kafka datagen
(scripts/lab3_datagen.py, scripts/lab4_datagen.py) is synthesized
deterministically in-test: stable per-window baselines plus ONE planted
surge, so the anomaly contract holds by construction and bit-identically
on every run. Agent prompts keep the walkthroughs' structural contracts
(section labels, verdict vocabulary, tool workflow) verbatim and abridge
the surrounding prose.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json

from quickstart_streaming_agents_spark.registries import EngineCatalog, Model
from quickstart_streaming_agents_spark.providers import fake_embedding
from quickstart_streaming_agents_spark.script import run_sql_script
from quickstart_streaming_agents_spark.session import ship_package
from quickstart_streaming_agents_spark.sql import (
    register_engine_sql,
    register_vector_table_sql,
)

_FAILURE_MARKERS = ("unable to dispatch", "failed to", "error:", "could not")
_VALID_VERDICTS = {
    "APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS",
    "DENY_INELIGIBLE", "DENY_FRAUD",
}


def _wiggle(key: str, amplitude: int, steps: int = 3) -> int:
    """Deterministic bounded noise in {-amplitude, …, +amplitude} — an
    md5 hash, aperiodic so the AR fit cannot learn it to zero residual
    (a learnable pattern would collapse sigma and flag everything)."""
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return (h % steps - steps // 2) * (amplitude // (steps // 2))


def _register_vectordb(spark, name: str, rows: list[dict], id_col: str):
    """External-vector-table analog (the labs' MongoDB/CosmosDB tables,
    terraform/lab4-pubsec-fraud-agents/main.tf:165-181): embed the text
    with the SAME fake embedding model the chain's ML_PREDICT uses, so
    query/corpus vectors live in one space."""
    model = Model(name="llm_embedding_model", task="embedding")
    embs = fake_embedding([r["chunk"] for r in rows], model)
    data = [{**r, "embedding": e} for r, e in zip(rows, embs)]
    df = spark.createDataFrame(data)
    register_vector_table_sql(spark, name, df, id_col=id_col)


# ---------------------------------------------------------------------------
# Lab 3 — fleet surge dispatch (LAB3-Walkthrough.md:147-472)
# ---------------------------------------------------------------------------

def _lab3_ride_requests(spark):
    """3 zones × 300 five-minute windows; baseline 40±1 requests per
    (zone, window); ONE planted surge of 200 in French Quarter at window
    296. minTrainingSize=286 (the walkthrough's own figure) means only
    the last ~14 windows per zone are scored; the bounded ±1 baseline
    noise keeps every scored non-surge row far inside the 99.9% band."""
    zones = ["French Quarter", "Garden District", "Marigny"]
    base = dt.datetime(2024, 3, 1)
    rows = []
    for w in range(300):
        ws = base + dt.timedelta(minutes=5 * w)
        for z in zones:
            count = 40 + _wiggle(f"{z}|{w}", 1)
            if z == "French Quarter" and w == 296:
                count = 200
            for i in range(count):
                rows.append((
                    f"r{w}-{z[:2]}-{i}",
                    ws + dt.timedelta(seconds=(i * 7) % 300),
                    z,
                    1 + i % 3,
                    f"{12 + i % 5}.50",
                ))
    spark.createDataFrame(
        rows,
        "ride_id string, request_ts timestamp, pickup_zone string, "
        "number_of_passengers int, price string",
    ).createOrReplaceTempView("ride_requests")


def test_lab3_walkthrough_chain_end_to_end(spark):
    ship_package(spark)
    cat = EngineCatalog()
    _lab3_ride_requests(spark)
    _register_vectordb(spark, "documents_vectordb_lab3", [
        {"document_id": "doc-jazzfest",
         "chunk": "French Quarter Jazz Festival, 7:00 PM - 11:00 PM, "
                  "expected attendance 12000, Bourbon Street stages."},
        {"document_id": "doc-conf",
         "chunk": "Riverfront tech conference, Garden District convention "
                  "hall, 9:00 AM - 5:00 PM, attendance 3000."},
        {"document_id": "doc-game",
         "chunk": "Marigny street parade, 2:00 PM - 6:00 PM, local "
                  "attendance 800."},
        {"document_id": "doc-generic",
         "chunk": "No major events scheduled; typical weekday traffic "
                  "patterns across all zones."},
    ], id_col="document_id")
    register_engine_sql(spark, cat)

    # stage 1+2: models/connection/tool/agent DDL + anomalies_per_zone —
    # LAB3-Walkthrough.md:147-198 verbatim (CREATE MODEL analogs replace
    # the terraform-provisioned endpoints, terraform/core/main.tf:308-446)
    run_sql_script(spark, """
        CREATE MODEL `llm_embedding_model` INPUT (text STRING)
            OUTPUT (embedding ARRAY<FLOAT>) WITH ('provider' = 'fake');
        CREATE MODEL `llm_textgen_model` INPUT (prompt STRING)
            OUTPUT (response STRING) WITH ('provider' = 'fake');
        CREATE MODEL `remote_mcp_model` INPUT (prompt STRING)
            OUTPUT (response STRING) WITH ('provider' = 'fake');
        CREATE CONNECTION `remote-mcp-connection` WITH (
            'type' = 'mcp_server', 'endpoint' = 'http://localhost:9/mcp');

        CREATE TABLE anomalies_per_zone AS
        WITH windowed_traffic AS (
            SELECT
                window_start,
                window_end,
                window_time,
                pickup_zone,
                COUNT(*) AS request_count,
                SUM(number_of_passengers) AS total_passengers,
                SUM(CAST(price AS DECIMAL(10, 2))) AS total_revenue
            FROM TABLE(
                TUMBLE(TABLE ride_requests, DESCRIPTOR(request_ts), INTERVAL '5' MINUTE)
            )
            GROUP BY window_start, window_end, window_time, pickup_zone
        ),
        anomaly_detection AS (
            SELECT
                pickup_zone,
                window_time,
                request_count,
                total_passengers,
                total_revenue,
                ML_DETECT_ANOMALIES(
                    CAST(request_count AS DOUBLE),
                    window_time,
                    JSON_OBJECT(
                        'minTrainingSize' VALUE 286,
                        'maxTrainingSize' VALUE 7000,
                        'confidencePercentage' VALUE 99.9,
                        'enableStl' VALUE FALSE
                    )
                ) OVER (
                    PARTITION BY pickup_zone
                    ORDER BY window_time
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS anomaly_result
            FROM windowed_traffic
        )
        SELECT
            pickup_zone,
            window_time,
            request_count,
            total_passengers,
            total_revenue,
            CAST(ROUND(anomaly_result.forecast_value) AS BIGINT) AS expected_requests,
            anomaly_result.upper_bound AS upper_bound,
            anomaly_result.lower_bound AS lower_bound,
            anomaly_result.is_anomaly AS is_surge
        FROM anomaly_detection
        WHERE anomaly_result.is_anomaly = true
          AND request_count > anomaly_result.upper_bound;
    """, catalog=cat)

    # reference contract (test_lab3.py:248-257): ≥1 message, ≤2, and
    # every anomaly zone is French Quarter
    anomalies = spark.table("anomalies_per_zone").collect()
    assert 1 <= len(anomalies) <= 2, [r.pickup_zone for r in anomalies]
    assert all(r.pickup_zone == "French Quarter" for r in anomalies)

    # stage 3: anomalies_enriched — LAB3-Walkthrough.md:224-372 verbatim
    # (embed the surge query, top-3 vector search, LLM reason)
    run_sql_script(spark, """
        CREATE TABLE anomalies_enriched
        WITH ('changelog.mode' = 'append')
        AS SELECT
            pickup_zone,
            window_time,
            request_count,
            expected_requests,
            anomaly_reason,
            top_chunk_1,
            top_chunk_2,
            top_chunk_3
        FROM (
            SELECT
                rad_with_rag.pickup_zone,
                rad_with_rag.window_time,
                rad_with_rag.request_count,
                rad_with_rag.expected_requests,
                rad_with_rag.is_surge,
                TRIM(llm_response.response) AS anomaly_reason,
                rad_with_rag.top_chunk_1,
                rad_with_rag.top_chunk_2,
                rad_with_rag.top_chunk_3
            FROM (
                SELECT
                    rad.pickup_zone,
                    rad.window_time,
                    rad.request_count,
                    rad.expected_requests,
                    rad.is_surge,
                    rad.query,
                    vs.search_results[1].document_id AS top_document_1,
                    vs.search_results[1].chunk AS top_chunk_1,
                    vs.search_results[1].score AS top_score_1,
                    vs.search_results[2].document_id AS top_document_2,
                    vs.search_results[2].chunk AS top_chunk_2,
                    vs.search_results[2].score AS top_score_2,
                    vs.search_results[3].document_id AS top_document_3,
                    vs.search_results[3].chunk AS top_chunk_3,
                    vs.search_results[3].score AS top_score_3
                FROM (
                    SELECT
                        pickup_zone,
                        window_time,
                        request_count,
                        expected_requests,
                        is_surge,
                        CONCAT(
                            'Transportation demand surge in ',
                            pickup_zone,
                            ' at ',
                            DATE_FORMAT(window_time, 'h:mm a'),
                            ' during ',
                            CASE
                                WHEN HOUR(window_time) >= 17 AND HOUR(window_time) < 20 THEN 'evening dinner period (5:00 PM - 8:00 PM)'
                                WHEN HOUR(window_time) >= 20 AND HOUR(window_time) < 23 THEN 'nightlife hours (8:00 PM - 11:00 PM)'
                                ELSE 'daytime hours'
                            END,
                            '. Looking for HIGH demand events occurring between ',
                            DATE_FORMAT(window_time - INTERVAL '1' HOUR, 'h:mm a'),
                            ' and ',
                            DATE_FORMAT(window_time + INTERVAL '1' HOUR, 'h:mm a'),
                            '. Expected: ',
                            CAST(expected_requests AS STRING),
                            ', Actual: ',
                            CAST(request_count AS STRING),
                            ' (+',
                            CAST(ROUND(((request_count - expected_requests) / expected_requests) * 100, 1) AS STRING),
                            '%). What HIGH impact events, festivals, or gatherings are active in ',
                            pickup_zone,
                            ' during this time?'
                        ) AS query,
                        emb.embedding
                    FROM anomalies_per_zone,
                    LATERAL TABLE(ML_PREDICT('llm_embedding_model',
                        CONCAT('Transportation demand surge in ', pickup_zone)
                    )) AS emb
                    WHERE is_surge = true
                ) AS rad,
                LATERAL TABLE(
                    VECTOR_SEARCH_AGG(
                        documents_vectordb_lab3,
                        DESCRIPTOR(embedding),
                        rad.embedding,
                        3
                    )
                ) AS vs
            ) AS rad_with_rag,
            LATERAL TABLE(
                ML_PREDICT(
                    'llm_textgen_model',
                    CONCAT(
                        'Analyze the retrieved event documents and identify the most likely cause of this transportation demand surge. Always provide a concise 1-2 sentence answer.\\n\\n',
                        'USER QUERY: ', rad_with_rag.query, '\\n\\n',
                        'RETRIEVED DOCUMENTS:\\n',
                        'Document 1 (Score: ', CAST(rad_with_rag.top_score_1 AS STRING), '):\\n',
                        'Source: ', rad_with_rag.top_document_1, '\\n',
                        rad_with_rag.top_chunk_1, '\\n\\n',
                        'Document 2 (Score: ', CAST(rad_with_rag.top_score_2 AS STRING), '):\\n',
                        rad_with_rag.top_chunk_2, '\\n\\n',
                        'Provide only the reason, no additional text.'
                    )
                )
            ) AS llm_response
        );
    """, catalog=cat)

    # reference contract (test_lab3.py:282-296): rows exist and
    # top_chunk_1/2 are populated
    enriched = spark.table("anomalies_enriched").collect()
    assert enriched
    first = enriched[0]
    assert (first.top_chunk_1 or first.top_chunk_2 or "").strip()
    assert first.anomaly_reason and first.anomaly_reason.strip()

    # stage 4: tool + agent DDL and completed_actions —
    # LAB3-Walkthrough.md:385-472 (prompt abridged to its structural
    # contract: workflow tools + the THREE-section response format)
    run_sql_script(spark, """
        CREATE TOOL lab3_remote_mcp
        USING CONNECTION `remote-mcp-connection`
        WITH (
          'type' = 'mcp',
          'allowed_tools' = 'http_get, http_post',
          'request_timeout' = '30'
        );
        CREATE AGENT `boat_dispatch_agent`
        USING MODEL `remote_mcp_model`
        USING PROMPT 'You are an intelligent boat dispatch coordinator for a riverboat ride-sharing service.

Your workflow:
1. ANALYZE the surge information provided (zone, time, request count).
2. REVIEW the available vessels list by using the http_get tool.
3. SELECT appropriate boats to dispatch and CREATE a JSON dispatch request.
4. USE the http_post tool to POST the dispatch request.

5. FORMAT your final response with these THREE sections:

Dispatch Summary:
Due to the surge in demand in [zone] as a result of [event], we dispatched [n] additional boats from [list of zones].

Dispatch JSON:
{your dispatch JSON here}

API Response:
{the response from the API call}

CRITICAL INSTRUCTIONS:
- Your response MUST contain the three labeled sections
- NEVER ask for clarification. Act immediately.'
        USING TOOLS `lab3_remote_mcp`
        WITH (
          'max_iterations' = '10'
        );
        CREATE TABLE completed_actions (
            PRIMARY KEY (pickup_zone) NOT ENFORCED
        )
        WITH ('changelog.mode' = 'append')
        AS SELECT
            pickup_zone,
            window_time,
            request_count,
            anomaly_reason,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Dispatch Summary:\\*{0,2}\\s*\\n([\\s\\S]+?)(?=\\n\\n\\*{0,2}Dispatch JSON:\\*{0,2})', 1)) AS dispatch_summary,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Dispatch JSON:\\*{0,2}\\s*\\n(?:```json\\s*)?([\\s\\S]+?)(?:```)?(?=\\n\\n\\*{0,2}API Response:\\*{0,2})', 1)) AS dispatch_json,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}API Response:\\*{0,2}\\s*\\n(?:```json\\s*)?([\\s\\S]+?)(?:```)?$', 1)) AS api_response,
            CAST(response AS STRING) AS raw_response
        FROM anomalies_enriched,
        LATERAL TABLE(AI_RUN_AGENT(
            `boat_dispatch_agent`,
            `anomaly_reason`,
            `pickup_zone`
        ));
    """, catalog=cat)

    # reference contract (test_lab3.py:339): a dispatch summary exists
    # and contains no failure marker
    actions = spark.table("completed_actions").collect()
    assert actions
    for r in actions:
        assert r.dispatch_summary and r.dispatch_summary.strip(), r.raw_response
        for marker in _FAILURE_MARKERS:
            assert marker not in r.dispatch_summary.lower()
        json.loads(r.dispatch_json)  # the extracted JSON section is valid


# ---------------------------------------------------------------------------
# Lab 4 — FEMA claims fraud agents (LAB4-Walkthrough.md:123-436)
# ---------------------------------------------------------------------------

def _lab4_claims(spark):
    """3 cities × 30 six-hour windows; 3 claims per (city, window) with a
    near-constant $30k total plus a two-level aperiodic wiggle (±$600 for
    the first 12 windows, ±$300 after — the early taper keeps the
    small-dof fits' 95% band above later excursions); ONE planted spike
    in Naples in the LAST window (a mid-series spike poisons the AR lags
    of every later window — the fit's upper bound goes wildly negative
    and normal rows flag above-upper, verified by offline simulation with
    ar_one_step). Salt 212 was chosen by that simulation: the only
    above-upper row is the Naples spike, with ≥$354 margin everywhere
    else. The datagen analog of scripts/lab4_datagen.py's Helene spike."""
    cities = ["Naples", "Tampa", "Miami"]
    base = dt.datetime(2024, 9, 26)
    rows = []
    for w in range(30):
        ws = base + dt.timedelta(hours=6 * w)
        for city in cities:
            amp = 600 if w < 12 else 300
            h = int(hashlib.md5(f"212|{city}|{w}".encode()).hexdigest()[:8], 16)
            amounts = [10000, 10000, 10000 + ((h % 2) * 2 - 1) * amp]
            if city == "Naples" and w == 29:
                amounts += [80000] * 10
            for i, amt in enumerate(amounts):
                big = amt >= 80000
                rows.append((
                    f"c{w}-{city[:2]}-{i}",
                    f"Applicant {city} {w}-{i}",
                    city,
                    ("Our Naples beach house we rent out seasonally was "
                     "flooded; claiming full replacement.") if big
                    else f"Roof and siding damage from hurricane winds, "
                         f"claim {i}.",
                    str(amt),
                    float(amt) * (0.5 if big else 1.2),
                    "yes" if i % 2 == 0 else "no",
                    float(amt) * 0.25,
                    "no" if big else "yes",
                    "2024-10-01",
                    "2024-09-26",
                    "Self" if big else "FEMA Inspector",
                    "no",
                    "no",
                    2 if big else 0,
                    "2022-08-30" if big else "",
                    ws + dt.timedelta(minutes=13 * i + 7),
                ))
    spark.createDataFrame(
        rows,
        "claim_id string, applicant_name string, city string, "
        "claim_narrative string, claim_amount string, "
        "damage_assessed double, has_insurance string, "
        "insurance_amount double, is_primary_residence string, "
        "assessment_date string, disaster_date string, "
        "assessment_source string, shared_account string, "
        "shared_phone string, previous_claims_count int, "
        "last_claim_date string, claim_timestamp timestamp",
    ).createOrReplaceTempView("claims")


def test_lab4_walkthrough_chain_end_to_end(spark):
    ship_package(spark)
    cat = EngineCatalog()
    _lab4_claims(spark)
    _register_vectordb(spark, "fema_policies_vectordb", [
        {"title": "IHP Housing Assistance Eligibility",
         "section_reference": "IAPPG 3.1",
         "pages": "41-44",
         "chunk": "IHP Housing Assistance is restricted to the applicant "
                  "primary dwelling; rental and vacation properties are "
                  "categorically excluded.",
         "fraud_categories": "non_primary_residence",
         "policy_keywords": "primary residence, vacation home"},
        {"title": "Duplication of Benefits",
         "section_reference": "IAPPG 2.7",
         "pages": "28-30",
         "chunk": "FEMA assistance covers only the uncompensated gap after "
                  "insurance payouts; duplicated benefits must be repaid.",
         "fraud_categories": "duplication",
         "policy_keywords": "insurance, duplication of benefits"},
        {"title": "Damage Verification Standards",
         "section_reference": "IAPPG 4.2",
         "pages": "55-58",
         "chunk": "Claims require third-party damage verification; "
                  "self-assessments are not accepted as the sole basis.",
         "fraud_categories": "self_assessment",
         "policy_keywords": "inspection, verification"},
    ], id_col="title")
    register_engine_sql(spark, cat)

    results = run_sql_script(spark, """
        CREATE MODEL `llm_embedding_model` INPUT (text STRING)
            OUTPUT (embedding ARRAY<FLOAT>) WITH ('provider' = 'fake');
        CREATE MODEL `llm_textgen_model` INPUT (prompt STRING)
            OUTPUT (response STRING) WITH ('provider' = 'fake');

        SET 'sql.state-ttl' = '14 d';

        CREATE TABLE claims_anomalies_by_city AS
        WITH windowed_claims AS (
            SELECT
                window_start,
                window_end,
                window_time,
                city,
                COUNT(*) AS claim_count,
                SUM(CAST(claim_amount AS DOUBLE)) AS total_claim_amount,
                CAST(ROUND(AVG(CAST(claim_amount AS DOUBLE))) AS BIGINT) AS avg_claim_amount,
                SUM(CAST(damage_assessed AS DOUBLE)) AS total_damage_assessed
            FROM TABLE(
                TUMBLE(TABLE claims, DESCRIPTOR(claim_timestamp), INTERVAL '6' HOUR)
            )
            GROUP BY window_start, window_end, window_time, city
        ),
        anomaly_detection AS (
            SELECT
                city,
                window_time,
                claim_count,
                total_claim_amount,
                avg_claim_amount,
                total_damage_assessed,
                ML_DETECT_ANOMALIES(
                    CAST(total_claim_amount AS DOUBLE),
                    window_time,
                    JSON_OBJECT(
                        'minTrainingSize' VALUE 8,
                        'maxTrainingSize' VALUE 50,
                        'confidencePercentage' VALUE 95.0,
                        'enableStl' VALUE FALSE
                    )
                ) OVER (
                    PARTITION BY city
                    ORDER BY window_time
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS anomaly_result
            FROM windowed_claims
        )
        SELECT
            city,
            window_time,
            claim_count,
            total_claim_amount,
            avg_claim_amount,
            total_damage_assessed,
            CAST(ROUND(anomaly_result.forecast_value) AS BIGINT) AS expected_claim_amount,
            anomaly_result.upper_bound AS upper_bound,
            anomaly_result.lower_bound AS lower_bound,
            anomaly_result.is_anomaly AS is_anomaly
        FROM anomaly_detection
        WHERE anomaly_result.is_anomaly = true
          AND total_claim_amount > anomaly_result.upper_bound;

        CREATE TABLE claims_to_investigate AS
        SELECT
            c.claim_id,
            c.applicant_name,
            c.city,
            c.claim_narrative,
            c.claim_amount,
            c.damage_assessed,
            c.has_insurance,
            c.insurance_amount,
            c.is_primary_residence,
            c.assessment_date,
            c.disaster_date,
            c.assessment_source,
            c.shared_account,
            c.shared_phone,
            c.previous_claims_count,
            c.last_claim_date,
            c.claim_timestamp,
            a.window_time AS anomaly_window_time,
            a.total_claim_amount AS anomaly_total_amount,
            a.is_anomaly
        FROM claims c
        INNER JOIN claims_anomalies_by_city a
            ON c.city = a.city
            AND c.claim_timestamp >= a.window_time - INTERVAL '6' HOUR
            AND c.claim_timestamp <= a.window_time
        WHERE c.claim_narrative <> ''
        LIMIT 10;

        CREATE TABLE claims_to_investigate_with_policies AS
        WITH embedded AS (
            SELECT
                c.*,
                e.embedding AS narrative_embedding
            FROM claims_to_investigate c,
            LATERAL TABLE(ML_PREDICT('llm_embedding_model', c.claim_narrative)) e
        )
        SELECT
            c.claim_id,
            c.applicant_name,
            c.city,
            c.claim_amount,
            c.damage_assessed,
            c.has_insurance,
            c.insurance_amount,
            c.is_primary_residence,
            c.claim_narrative,
            c.assessment_source,
            c.previous_claims_count,
            c.claim_timestamp,
            c.anomaly_window_time,
            c.anomaly_total_amount,
            c.is_anomaly,
            vs.search_results[1].chunk AS policy_chunk_1,
            vs.search_results[1].score AS policy_score_1,
            vs.search_results[1].pages AS policy_pages_1,
            vs.search_results[1].section_reference AS policy_section_1,
            vs.search_results[1].title AS policy_title_1,
            vs.search_results[1].fraud_categories AS policy_fraud_cats_1,
            vs.search_results[1].policy_keywords AS policy_keywords_1,
            vs.search_results[2].chunk AS policy_chunk_2,
            vs.search_results[2].score AS policy_score_2,
            vs.search_results[2].section_reference AS policy_section_2,
            vs.search_results[2].title AS policy_title_2,
            vs.search_results[3].chunk AS policy_chunk_3,
            vs.search_results[3].score AS policy_score_3,
            vs.search_results[3].section_reference AS policy_section_3,
            vs.search_results[3].title AS policy_title_3
        FROM embedded c,
        LATERAL TABLE(
            VECTOR_SEARCH_AGG(
                fema_policies_vectordb,
                DESCRIPTOR(embedding),
                c.narrative_embedding,
                3
            )
        ) vs;

        CREATE AGENT `claims_fraud_investigation_agent`
        USING MODEL `llm_textgen_model`
        USING PROMPT 'OUTPUT RULES — read before anything else:
1. Respond with ONLY these four labeled sections, in this exact order:
   Verdict:
   Issues Found:
   Policy Basis:
   Summary:
2. NO markdown. Plain text only.
3. The Verdict line must contain exactly one word: APPROVE, APPROVE_PARTIAL, REQUEST_DOCS, DENY_INELIGIBLE, or DENY_FRAUD.

You are a FEMA IHP fraud detection agent reviewing Hurricane Helene disaster assistance claims.

CHECKLIST — evaluate in order: claim ceiling, duplication of benefits, primary residence, assessment source, property use, ineligible items, pre-existing damage, explicit duplication, prior claims.

In Policy Basis: cite specific section titles and references from the retrieved FEMA policy chunks.'
        WITH (
          'max_iterations' = '10'
        );

        CREATE TABLE claims_reviewed (
            PRIMARY KEY (claim_id) NOT ENFORCED
        )
        WITH ('changelog.mode' = 'append')
        AS SELECT
            claim_id,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Verdict:\\*{0,2}\\s*([A-Z_]+)', 1)) AS verdict,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Summary:\\*{0,2}\\n([\\s\\S]+?)$', 1)) AS summary,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Issues Found:\\*{0,2}\\n([\\s\\S]+?)(?=\\n\\*{0,2}(?:Policy Basis|Summary|Verdict):|$)', 1)) AS issues_found,
            TRIM(REGEXP_EXTRACT(CAST(response AS STRING), '\\*{0,2}Policy Basis:\\*{0,2}\\n([\\s\\S]+?)(?=\\n\\*{0,2}(?:Summary|Verdict):|$)', 1)) AS policy_basis,
            applicant_name,
            claim_narrative,
            claim_amount,
            damage_assessed,
            insurance_amount,
            is_primary_residence,
            assessment_source,
            previous_claims_count,
            CAST(response AS STRING) AS raw_response
        FROM claims_to_investigate_with_policies,
        LATERAL TABLE(AI_RUN_AGENT(
            `claims_fraud_investigation_agent`,
            CONCAT(
                'CLAIM FOR REVIEW: ', claim_id, '\\n',
                'Applicant: ', applicant_name, '\\n',
                'Claim Amount: $', claim_amount, '\\n',
                'Total Damage Assessed: $', COALESCE(CAST(damage_assessed AS STRING), '0'), '\\n',
                'Insurance Payout: $', COALESCE(CAST(insurance_amount AS STRING), '0'), '\\n',
                'Is Primary Residence: ', COALESCE(is_primary_residence, 'unknown'), '\\n',
                'Assessment Source: ', COALESCE(assessment_source, 'unknown'), '\\n',
                'Prior FEMA Claims: ', COALESCE(CAST(previous_claims_count AS STRING), '0'), '\\n',
                '\\nCLAIM NARRATIVE:\\n', COALESCE(claim_narrative, '(none)'), '\\n',
                '\\nRETRIEVED FEMA POLICY SECTIONS:\\n',
                '1. ', COALESCE(policy_title_1, 'N/A'), ' (', COALESCE(policy_section_1, 'N/A'), '):\\n',
                COALESCE(policy_chunk_1, ''), '\\n\\n',
                '2. ', COALESCE(policy_title_2, 'N/A'), ' (', COALESCE(policy_section_2, 'N/A'), '):\\n',
                COALESCE(policy_chunk_2, '')
            ),
            MAP['debug', 'true']
        ));
    """, catalog=cat)
    kinds = [r.kind for r in results]
    assert kinds == ["model", "model", "set", "ctas", "ctas", "ctas",
                     "agent", "ctas"]

    # reference contract (test_lab4.py:241-272): ≥1 anomaly, ≤2, only
    # Naples spikes
    anomalies = spark.table("claims_anomalies_by_city").collect()
    assert 1 <= len(anomalies) <= 2, [(r.city, r.window_time) for r in anomalies]
    assert all(r.city == "Naples" for r in anomalies)

    # investigate window: rows exist, narratives non-empty, all Naples
    to_investigate = spark.table("claims_to_investigate").collect()
    assert to_investigate and len(to_investigate) <= 10
    assert all(r.city == "Naples" and r.claim_narrative for r in to_investigate)

    # policies populated (test_lab4.py claims_to_investigate_with_policies)
    with_policies = spark.table("claims_to_investigate_with_policies").collect()
    assert with_policies
    assert all((r.policy_chunk_1 or "").strip() for r in with_policies)

    # reference contract (test_lab4.py:357-364): verdict non-empty and in
    # the five-value set; the four sections parsed out of the raw response
    reviewed = spark.table("claims_reviewed").collect()
    assert reviewed
    for r in reviewed:
        assert r.verdict in _VALID_VERDICTS, r.raw_response
        assert r.summary and r.summary.strip()
        assert r.policy_basis and r.policy_basis.strip()


# ---------------------------------------------------------------------------
# Lab 2 — vector search RAG (terraform/lab2-vector-search/main.tf:215-340)
# ---------------------------------------------------------------------------

def test_lab2_rag_chain_end_to_end(spark):
    """Lab2's terraform-deployed statement chain in its own spelling:
    queries → lateral embed (INSERT INTO) → VECTOR_SEARCH_AGG top-3 with
    flattened search_results[1..3] columns → lateral LLM answer
    (lowercase ml_predict, as deployed). Asserts the reference e2e's
    contracts (testing/e2e/test_lab2.py:100-133): search_results rows
    exist, the RAG response is non-empty — plus an exactness check the
    fake embedder affords: a query planted verbatim as a corpus chunk
    must retrieve that chunk at rank 1 with cosine ~1."""
    ship_package(spark)
    cat = EngineCatalog()
    planted = ("What ingredients are in the gumbo special and is it "
               "gluten free?")
    _register_vectordb(spark, "documents_vectordb_lab2", [
        {"document_id": "menu-001", "chunk": planted},
        {"document_id": "menu-002",
         "chunk": "The jambalaya platter contains shrimp, andouille "
                  "sausage, and rice; it is dairy free."},
        {"document_id": "faq-001",
         "chunk": "Reservations are accepted for parties of six or more; "
                  "walk-ins welcome otherwise."},
        {"document_id": "faq-002",
         "chunk": "We are open 11am to 10pm every day except major "
                  "holidays."},
    ], id_col="document_id")
    register_engine_sql(spark, cat)
    spark.createDataFrame(
        [(planted,), ("When are you open on holidays?",)],
        "query string",
    ).createOrReplaceTempView("queries")

    results = run_sql_script(spark, """
        CREATE MODEL `llm_embedding_model` INPUT (text STRING)
            OUTPUT (embedding ARRAY<FLOAT>) WITH ('provider' = 'fake');
        CREATE MODEL `llm_textgen_model` INPUT (prompt STRING)
            OUTPUT (response STRING) WITH ('provider' = 'fake');

        INSERT INTO queries_embed
        SELECT query, embedding FROM queries,
        LATERAL TABLE(ML_PREDICT('llm_embedding_model', query));

        CREATE TABLE IF NOT EXISTS search_results AS
        SELECT qe.query,
               vs.search_results[1].document_id AS document_id_1,
               vs.search_results[1].chunk AS chunk_1,
               vs.search_results[1].score AS score_1,
               vs.search_results[2].document_id AS document_id_2,
               vs.search_results[2].chunk AS chunk_2,
               vs.search_results[2].score AS score_2,
               vs.search_results[3].document_id AS document_id_3,
               vs.search_results[3].chunk AS chunk_3,
               vs.search_results[3].score AS score_3
        FROM queries_embed AS qe,
        LATERAL TABLE(VECTOR_SEARCH_AGG(
            documents_vectordb_lab2, DESCRIPTOR(embedding),
            qe.embedding, 3
        )) AS vs;

        CREATE TABLE IF NOT EXISTS search_results_response AS
        SELECT sr.query, sr.document_id_1, sr.chunk_1, sr.score_1,
               sr.document_id_2, sr.chunk_2, sr.score_2,
               sr.document_id_3, sr.chunk_3, sr.score_3, pred.response
        FROM search_results sr,
        LATERAL TABLE( ml_predict( 'llm_textgen_model', CONCAT(
            'Based on the following search results, provide a helpful response.\\n\\nUSER QUERY: ',
            sr.query,
            '\\n\\nDocument 1 (Similarity Score: ', CAST(sr.score_1 AS STRING), '):\\nSource: ',
            sr.document_id_1, '\\nContent: ', sr.chunk_1,
            '\\n\\nRESPONSE:' ) ) ) AS pred;
    """, catalog=cat)
    assert [r.kind for r in results] == ["model", "model", "insert",
                                         "ctas", "ctas"]

    sr = {r.query: r for r in spark.table("search_results").collect()}
    assert len(sr) == 2
    # the planted query is verbatim a corpus chunk: identical fake
    # embeddings, cosine 1 at rank 1
    hit = sr[planted]
    assert hit.document_id_1 == "menu-001"
    assert abs(hit.score_1 - 1.0) < 1e-9
    assert hit.chunk_1 == planted
    assert hit.score_1 >= hit.score_2 >= hit.score_3

    resp = spark.table("search_results_response").collect()
    assert len(resp) == 2
    for r in resp:
        assert r.response and r.response.strip()  # test_lab2.py:133

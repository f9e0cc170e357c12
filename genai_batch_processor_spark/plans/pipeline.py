"""Pipeline facades — the engine's public API, mirroring the reference's
two-method contract ``run()`` + ``validate_request()``
(``src/genai_batch_processor/base.py:4-15``) re-expressed as composed
DataFrame stages.

Lifecycle (reference entry point 1, SURVEY.md §3): validate (limit(1)
probe) → build requests → sharded JSONL sink → submit/poll via the
orchestrator boundary → explicit-schema result scan → error split →
content/answer extraction → join-back → ordered results. Every stage
except submit/poll is a distributed DataFrame job; nothing round-trips
through driver memory (the reference materializes the whole input at
``oai:277`` and the whole output at ``oai:229``).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from genai_batch_processor_spark.functions import ids
from genai_batch_processor_spark.inference import orchestrator
from genai_batch_processor_spark.operators import batching, joinback, requests
from genai_batch_processor_spark.sources import bigquery, jsonl, schemas


class BatchPipeline:
    """Base facade (reference base.py:4-15 contract).

    Subclasses bind a request builder; the backend (provider boundary) is
    injected, defaulting to the hermetic LocalMockBackend.
    """

    def __init__(
        self,
        spark: SparkSession,
        backend: orchestrator.BatchBackend | None = None,
        work_dir: str | None = None,
    ):
        self.spark = spark
        self.backend = backend or orchestrator.LocalMockBackend(spark)
        # Resource ledger (#30, vtx:34-52/:327-354): every temp path this
        # pipeline mints is recorded so cleanup() can remove it. A caller-
        # provided work_dir is the CALLER's resource and is never deleted.
        self._owned_paths: list[str] = []
        if work_dir is None:
            work_dir = tempfile.mkdtemp(prefix="genai_spark_")
            self._owned_paths.append(work_dir)
        self.work_dir = work_dir
        # Run telemetry (filled by run()): submit-side counts come from
        # a Spark Observation riding the sink job — measured during the
        # write action, no extra count() job; job metadata comes from
        # the orchestrator manifest.
        self.last_metrics: dict = {}

    def cleanup(self) -> list[str]:
        """Remove every temp path this pipeline created (vtx:327-354
        semantics, as an explicit ledger instead of attribute scraping).
        Returns the removed paths; idempotent."""
        removed = []
        for p in self._owned_paths:
            if os.path.exists(p):
                shutil.rmtree(p, ignore_errors=True)
            removed.append(p)
        self._owned_paths.clear()
        return removed

    # -- reference contract ---------------------------------------------------

    def validate_request(self, df: DataFrame, **kwargs) -> bool:
        """Fail-fast pre-flight (#7/#20, oai:92-125 / vtx:70-107): run the
        builder on limit(1) and type-check against the request schema.
        The one genuine optimization in the reference — kept."""
        sample = self.build_requests(df.limit(1), **kwargs)
        row = sample.select("request").head()
        return row is not None and row["request"]["custom_id"] is not None

    def build_requests(self, df: DataFrame, **kwargs) -> DataFrame:
        raise NotImplementedError

    # -- provider wire hooks (override per wire format) -----------------------

    def _response_schema(self):
        return schemas.OPENAI_RESPONSE

    def _read_responses(self, output_path: str) -> DataFrame:
        rows, _corrupt = jsonl.read_jsonl(
            self.spark, output_path, self._response_schema()
        )
        return rows.select(F.struct(*rows.columns).alias("resp"))

    def _empty_responses(self) -> DataFrame:
        cols = self.spark.createDataFrame([], self._response_schema())
        return cols.select(F.struct(*cols.columns).alias("resp"))

    def _resp_error(self) -> Column:
        """True for rows that belong in the error relation (#13/#38)."""
        return F.col("resp")["error"].isNotNull()

    def _resp_custom_id(self) -> Column:
        return F.col("resp.custom_id")

    def _dedup_key(self) -> Column:
        """Prompt-identity key for submit-side dedup: the request BODY
        (everything the provider prices), excluding the per-row
        custom_id."""
        return F.to_json(F.col("request.body"))

    def _rewrite_resp_custom_id(self, resp: Column, new_cid: Column) -> Column:
        """Re-key a representative's response struct to an original
        row's custom_id during fan-out."""
        return resp.withField("custom_id", new_cid)

    # -------------------------------------------------------------------------

    def _assemble(
        self, with_req: DataFrame, resp: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """Shared lifecycle tail: error split → join-back. One code path
        for empty and non-empty runs, so their schemas cannot diverge.
        The response-side join key is dropped after the join — the result
        carries ONE custom_id column (the input side's)."""
        err = self._resp_error()
        results, errors = resp.filter(~err), resp.filter(err)
        joined = joinback.attach_results(
            with_req.withColumn("custom_id", F.col("request.custom_id")),
            results.select(
                "resp", self._resp_custom_id().alias("__resp_custom_id")
            ),
            id_col="idx",
            custom_id_col="__resp_custom_id",
            how="inner",
        ).drop("__resp_custom_id")
        return joined, errors

    def run(
        self,
        df: DataFrame,
        *,
        validate: bool = True,
        input_path: str | None = None,
        dedupe_prompts: bool = False,
        poll_interval_seconds: float = 1.0,
        timeout_seconds: float = 7200.0,
        **build_kwargs,
    ) -> tuple[DataFrame, DataFrame]:
        """Full lifecycle → (results, errors) DataFrames (oai:262-303).

        Empty-input short-circuit (#15, oai:277-280) returns EMPTY
        relations with the same schemas as a non-empty run — downstream
        unions must not break only on the empty path. NO catch-all
        exception swallowing (deliberate departure from oai:298-302).

        ``input_path`` (#31, vtx:405-407): a pre-existing request-JSONL
        path skips the build+write stage entirely; the requests on disk
        are joined back to ``df`` by their custom_id ordinal, so results
        are identical to a built run over the same input.

        ``dedupe_prompts`` (operators/batching.py): only one
        representative per distinct request BODY crosses the provider
        boundary; responses fan back to every original row re-keyed to
        its own custom_id. Duplicate rows inherit their
        representative's answer AND error fate — the cost of paying for
        the prompt once.
        """
        self.last_metrics = {}
        if dedupe_prompts and input_path is not None:
            raise ValueError(
                "dedupe_prompts needs the build stage; it cannot apply "
                "to a pre-built input_path (the shards on disk already "
                "fixed the submit set)"
            )
        if df.isEmpty():
            with_req = self.build_requests(df, **build_kwargs)
            return self._assemble(with_req, self._empty_responses())

        fan_mapping: DataFrame | None = None
        if input_path is None:
            if validate and not self.validate_request(df, **build_kwargs):
                raise ValueError("validate_request failed on sample item")
            with_req = self.build_requests(df, **build_kwargs)
            submit_set = with_req
            n_obs: Observation | None = None
            if dedupe_prompts:
                keyed = with_req.withColumn("__pkey", self._dedup_key())
                groups = batching.prompt_groups(keyed, "__pkey", "idx")
                # Representatives carry each group's multiplicity so
                # n_input_rows is observed during the write action — no
                # separate agg job re-running build_requests + the
                # groupBy (round-3 ADVICE: the class promises
                # write-time telemetry).
                n_obs = Observation(f"dedupe-{uuid.uuid4().hex[:6]}")
                submit_set = batching.representatives(
                    keyed, "__pkey", "idx",
                    groups=groups, carry=("n_rows",),
                ).observe(
                    n_obs,
                    F.sum("n_rows").cast("long").alias("n_input_rows"),
                ).drop("__pkey", "n_rows")
                fan_mapping = keyed.select("idx", "__pkey").join(
                    groups.select("__pkey", "rep_idx"), "__pkey"
                ).select("idx", "rep_idx")
            input_path = os.path.join(self.work_dir, "input")
            obs = Observation(f"submit-{uuid.uuid4().hex[:6]}")
            to_write = submit_set.select("request.*").observe(
                obs,
                F.count(F.lit(1)).alias("n_submitted"),
                F.sum(F.octet_length(F.to_json(F.struct("*"))))
                .cast("long")
                .alias("submit_bytes"),
            )
            jsonl.write_jsonl(to_write, input_path)
            self.last_metrics = dict(obs.get)
            self.last_metrics["n_input_rows"] = (
                n_obs.get["n_input_rows"] if n_obs is not None else None
            )
        else:
            # Passthrough: reconstruct the (input row, request) relation
            # from the shards on disk. Join on the custom_id ordinal —
            # the same key the response join-back uses.
            req_rows, _bad = jsonl.read_request_jsonl(self.spark, input_path)
            req = req_rows.select(
                F.struct(*req_rows.columns).alias("request")
            ).withColumn(
                "__req_idx", ids.extract_index(F.col("request.custom_id"))
            )
            with_req = df.join(
                req, df["idx"] == F.col("__req_idx"), "inner"
            ).drop("__req_idx")

        output_path = os.path.join(self.work_dir, "output")
        job = orchestrator.run_job(
            self.backend,
            input_path=input_path,
            output_path=output_path,
            manifest_dir=os.path.join(self.work_dir, "manifests"),
            poll_interval_seconds=poll_interval_seconds,
            timeout_seconds=timeout_seconds,
            # Distributed data plane: upload (submit_spark) and result
            # fetch run on executors for backends that support them;
            # the local mocks expose neither and are unaffected.
            spark=self.spark,
        )
        self.last_metrics["job_id"] = job.job_id
        self.last_metrics["n_batches"] = len(job.batch_ids)

        resp = self._read_responses(output_path)
        if fan_mapping is not None:
            resp = self._fan_out(resp, fan_mapping)
        return self._assemble(with_req, resp)

    def _fan_out(self, resp: DataFrame, mapping: DataFrame) -> DataFrame:
        """Expand representative responses to every original row: join
        on the representative ordinal (the response side has one row per
        DISTINCT body — the small, broadcast-eligible side), then re-key
        each response struct to the row's own custom_id so the standard
        join-back sees a 1:1 relation."""
        rep_idx = ids.extract_index(self._resp_custom_id())
        keyed = resp.withColumn("__rep_idx", rep_idx)
        expanded = mapping.join(
            keyed, mapping["rep_idx"] == keyed["__rep_idx"]
        )
        return expanded.select(
            self._rewrite_resp_custom_id(
                F.col("resp"), ids.custom_id("idx")
            ).alias("resp")
        )


class OpenAIBatchPipeline(BatchPipeline):
    """OpenAI-shaped requests (oai:79-90 builder surface)."""

    def __init__(self, *args, model: str = requests.DEFAULT_MODEL, **kwargs):
        super().__init__(*args, **kwargs)
        self.model = model
        self.azure_deployment: str | None = None

    def build_requests(
        self,
        df: DataFrame,
        *,
        user_content: Column | None = None,
        text_col: str = "text",
        id_col: str = "idx",
        labels: tuple[str, ...] = ("positive", "negative", "neutral"),
        **kwargs,
    ) -> DataFrame:
        content = user_content
        if content is None:
            prompt = requests.classification_prompt(text_col, labels)
            content = F.array(requests.text_part(prompt))
        return requests.build_openai_requests(
            df,
            id_col=id_col,
            user_content=content,
            model=self.model,
            azure_deployment=self.azure_deployment,
            **kwargs,
        )


class AzureOpenAIBatchPipeline(OpenAIBatchPipeline):
    """Azure preset (oai:306-328): body.model ← deployment name."""

    def __init__(self, *args, azure_deployment: str = "my-deployment", **kwargs):
        super().__init__(*args, **kwargs)
        self.azure_deployment = azure_deployment


class VertexAIBatchPipeline(BatchPipeline):
    """Vertex-shaped requests (vtx:54-68 builder surface), end to end:
    keyed envelope lines out, VERTEX_RESPONSE prediction rows back in
    (the reference's positional zip join is replaced by the passthrough
    custom_id — SURVEY §7). ``table_store`` binds the BigQuery boundary
    (vtx:138-176 input table, :282-296 result scan) — production injects
    :class:`~..sources.bigquery.BigQueryTableStore`, tests the local
    parquet double."""

    def __init__(
        self,
        spark: SparkSession,
        backend: orchestrator.BatchBackend | None = None,
        work_dir: str | None = None,
        table_store: bigquery.TableStore | None = None,
    ):
        super().__init__(
            spark,
            backend or orchestrator.VertexLocalMockBackend(spark),
            work_dir,
        )
        self.table_store = table_store

    def build_requests(
        self,
        df: DataFrame,
        *,
        text_col: str = "text",
        id_col: str = "idx",
        **kwargs,
    ) -> DataFrame:
        inner = requests.build_vertex_requests(
            df, user_text=F.col(text_col), **kwargs
        )
        # keyed envelope: {"custom_id": ..., "request": {...}} — Vertex
        # passes unknown input keys through to the output row
        return inner.withColumn(
            "request",
            F.struct(
                ids.custom_id(id_col).alias("custom_id"),
                F.col("request").alias("request"),
            ),
        )

    def validate_request(self, df: DataFrame, **kwargs) -> bool:
        """Structure-only check (vtx:70-107) — no provider call; the
        output-token clamp (vtx:93-97) caps the PROBE build at 128 even
        when the run requests more (a caller-passed value used to
        collide with the clamp keyword here)."""
        probe_kwargs = dict(kwargs)
        probe_kwargs["max_output_tokens"] = min(
            int(probe_kwargs.get("max_output_tokens", 128)), 128
        )
        sample = self.build_requests(df.limit(1), **probe_kwargs)
        return sample.select("request").head() is not None

    # -- vertex wire hooks ----------------------------------------------------

    def _response_schema(self):
        return schemas.VERTEX_RESPONSE

    def _resp_error(self) -> Column:
        return F.col("resp")["response"]["error"].isNotNull()

    def _resp_custom_id(self) -> Column:
        # the echoed request string carries the passthrough key
        return F.from_json(
            F.col("resp.request"), schemas.VERTEX_KEYED_REQUEST_LINE
        )["custom_id"]

    def _dedup_key(self) -> Column:
        # the priced payload is the inner GenerateContentRequest
        return F.to_json(F.col("request.request"))

    def _rewrite_resp_custom_id(self, resp: Column, new_cid: Column) -> Column:
        keyed = F.from_json(
            resp["request"], schemas.VERTEX_KEYED_REQUEST_LINE
        )
        return resp.withField(
            "request", F.to_json(keyed.withField("custom_id", new_cid))
        )

    # -- BigQuery/GCS boundary (vtx:138-176, 282-296, 298-325) ----------------

    def run_table_to_table(
        self,
        input_uri: str,
        output_uri: str,
        *,
        text_col: str = "text",
        order_col: str | None = None,
        id_col: str = "idx",
        **run_kwargs,
    ) -> tuple[DataFrame, DataFrame]:
        """Table-in → table-out lifecycle: read the input relation via
        URI-scheme dispatch (bq:// hits the TableStore), run the batch
        lifecycle, write results back out the same way. Returns the
        (results, errors) relations for further composition."""
        df = bigquery.read_input(self.spark, input_uri, self.table_store)
        if id_col not in df.columns:
            df = ids.assign_ids(df, order_col or text_col, id_col=id_col)
        results, errors = self.run(
            df, text_col=text_col, id_col=id_col, **run_kwargs
        )
        bigquery.write_output(results, output_uri, self.table_store)
        return results, errors

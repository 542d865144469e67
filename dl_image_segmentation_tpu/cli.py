"""Command-line interface: the driver layer.

The reference's only "driver program" is three notebooks
(/root/reference/create_training_samples.ipynb,
translate_chips_to_tfrecords.ipynb, parse_tfrecords.ipynb --
SURVEY.md L3). This CLI packages the same three workloads:

    dlseg-tpu create-chips   -- tile an AOI, composite imagery, burn
                                labels, write GeoTIFF chip pairs
    dlseg-tpu to-tfrecords   -- chip folders -> sharded TFRecords
    dlseg-tpu train          -- TFRecords -> U-Net training on TPU
    dlseg-tpu inspect        -- summarize shards / parse a record
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import os
import sys


def _date(s: str) -> _dt.date:
    return _dt.date.fromisoformat(s)


def cmd_create_chips(args) -> int:
    from .catalog import LocalCatalog, SyntheticCatalog
    from .pipeline.chips import (DLSampleCreationConfig, OGRLabelDataDesc)
    from .pipeline.export import run_export

    if args.catalog == "synthetic":
        catalog = SyntheticCatalog()
    elif args.catalog.startswith(("stac+http://", "stac+https://")):
        # STAC endpoint (static tree or item-search API) — the open
        # standard successor of the reference's DL scene service;
        # --processing-level filters items' processing:level property
        from .catalog.stac import STACCatalog
        level = args.processing_level
        catalog = STACCatalog(
            args.catalog,
            processing_level=None if level == "surface" else level)
    elif args.catalog.startswith(("http://", "https://")):
        # remote scene catalog (the reference's DL-API role,
        # _descartes_img_chips.py:512-513): COG windowed reads +
        # bounded retries; --processing-level picks the asset level
        from .catalog.http import HTTPCatalog
        catalog = HTTPCatalog(args.catalog,
                              processing_level=args.processing_level)
    else:
        catalog = LocalCatalog(args.catalog)
    cfg = DLSampleCreationConfig(
        tile_size=args.tile_size, tile_padding=args.pad,
        tile_res_m=args.resolution, dl_product=args.product,
        bands=args.bands, sample_folder_root=args.out,
        source_tag=args.tag,
        label_data_config=OGRLabelDataDesc(args.labels, args.layer,
                                           args.attribute),
        max_cloud_fraction=args.max_cloud_fraction,
        label_nodata_value=args.nodata,
        catalog=catalog)
    jobs = cfg.create_tile_job_configs(
        args.loc, args.year, ref_date=args.ref_date,
        min_date=args.min_date, max_date=args.max_date)
    print(f"{len(jobs)} tiles to export into "
          f"{cfg.images_dir_name(args.loc, args.year)}")
    report = run_export(jobs, n_workers=args.workers,
                        max_attempts=args.max_attempts,
                        low_priority=args.low_priority,
                        batch_tiles=args.batch_tiles)
    return 0 if report.ok else 1


def cmd_to_tfrecords(args) -> int:
    from .records.writers import (process_dataset_mp,
                                  process_dataset_multithreaded)
    if args.engine == "mt":
        n = process_dataset_multithreaded(
            args.name, args.directory, args.out, num_shards=args.shards,
            num_threads=args.workers,
            dltile_from_filename=not args.no_dltile_names,
            convert_png_to_jpg=args.png_to_jpg,
            store_as_array=args.store_as_array,
            resume=args.resume)
    else:
        n = process_dataset_mp(
            args.name, args.directory, args.out, num_shards=args.shards,
            num_proc=args.workers,
            dltile_from_filename=not args.no_dltile_names,
            file_ext=args.file_ext,
            store_as_array=args.store_as_array,
            resume=args.resume)
    print(f"wrote {n} examples")
    return 0


def cmd_convert(args) -> int:
    from .pipeline.convert import convert_chip_folder
    convert_chip_folder(
        args.directory, args.out, file_ext=args.file_ext, to=args.to,
        num_workers=args.workers, quality=args.quality,
        rescale=args.rescale, rescale_labels=args.rescale_labels)
    return 0


def cmd_train(args) -> int:
    from .pipeline.input import DevicePrefetcher, TFRecordFeed
    from .train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(num_classes=args.classes,
                      in_channels=args.channels,
                      base_features=args.features,
                      levels=args.levels,
                      image_size=args.image_size,
                      batch_size=args.batch_size,
                      learning_rate=args.lr,
                      weight_decay=args.weight_decay,
                      label_nodata=args.nodata,
                      n_model=args.n_model,
                      spatial=args.spatial,
                      fsdp=args.fsdp,
                      remat=args.remat,
                      s2d=args.s2d,
                      seed=args.seed,
                      model=args.model,
                      precision=args.precision,
                      schedule=args.schedule,
                      warmup_steps=args.warmup_steps,
                      total_steps=args.steps,
                      grad_clip_norm=args.grad_clip_norm,
                      class_weights=(
                          tuple(float(w) for w
                                in args.class_weights.split(","))
                          if args.class_weights else None),
                      augment_invert=args.augment_invert,
                      augment_brightness=args.augment_brightness,
                      augment_contrast=args.augment_contrast,
                      augment_geometric=args.augment)
    # any photometric knob implies augmentation (geometric ops stay
    # gated on --augment itself)
    do_augment = (args.augment or args.augment_invert > 0
                  or args.augment_brightness > 0
                  or args.augment_contrast > 0)
    trainer = Trainer(cfg)
    manager = None
    if args.save_every > 0:
        if not args.checkpoint:
            print("--save-every requires --checkpoint DIR", file=sys.stderr)
            return 2
        # rotating managed checkpoints + automatic latest-step resume:
        # the trainer-side equivalent of the chip/shard resume
        # invariants (a long run killed mid-way restarts where it left
        # off with the same command line)
        from . import storage as _storage
        ckpt_dir = args.checkpoint if _storage.is_remote(args.checkpoint) \
            else os.path.abspath(args.checkpoint)
        manager = trainer.checkpoint_manager(ckpt_dir, keep=args.keep)
        resumed = trainer.restore_latest(manager)
        if resumed is not None:
            print(f"resumed from managed checkpoint step {resumed}")
    # total-budget semantics apply ONLY to the managed auto-resume
    # (crash-restart with the same command line). A --restore
    # fine-tune keeps its checkpoint's step counter but still runs
    # the full --steps requested here.
    done_already = int(trainer.state.step)
    if args.restore:
        trainer.restore_checkpoint(args.restore)
        done_already = int(trainer.state.step)
        remaining = args.steps
    else:
        remaining = max(0, args.steps - done_already)
    # scale="raw" in BOTH modes: the feed keeps the SOURCE dtype, so a
    # uint8 batch is 4x less host-copy + H2D traffic (and a uint8 POOL
    # 4x less HBM). Scaling happens on device -- DeviceDataPool at
    # sample time, the train step via normalize_images (trace-time
    # dtype dispatch, numerics identical to host-side scaling).
    feed = TFRecordFeed(args.records, args.mode,
                        batch_size=args.batch_size,
                        image_size=args.image_size,
                        shuffle_buffer=args.shuffle_buffer,
                        num_workers=args.workers,
                        scale="raw", verify_crc=args.verify_crc)
    def maybe_save():
        # skip when this step is already on disk (e.g. a fully-resumed
        # run's final save): orbax refuses to overwrite an existing step
        if manager is not None and \
                manager.latest_step() != int(trainer.state.step):
            saved = trainer.save_managed(manager)
            print(f"managed checkpoint saved at step {saved}")

    mlog = open(args.metrics_log, "a", buffering=1) \
        if args.metrics_log else None

    def log_metrics(step, **kv):
        # one JSON object per line, appended (resumes continue the same
        # file) -- tail -f / jq-friendly run monitoring
        if mlog is not None:
            mlog.write(json.dumps(
                {"step": int(step),
                 **{k: round(float(v), 6) for k, v in kv.items()}}) + "\n")

    def run_eval(step):
        # a fresh non-repeating feed each time: the validation set is
        # read once, whole (dataset confusion-matrix mIoU)
        efeed = TFRecordFeed(args.eval_records, args.mode,
                             batch_size=args.batch_size,
                             image_size=args.image_size,
                             num_workers=args.workers, repeat=False,
                             scale="raw", verify_crc=args.verify_crc)
        out = trainer.evaluate(efeed.batches(),
                               max_batches=args.eval_max_batches)
        print(f"val step {step}: loss={out['loss']:.4f} "
              f"acc={out['accuracy']:.4f} miou={out['miou']:.4f} "
              f"over {out['batches']} batches")
        log_metrics(step, val_loss=out["loss"],
                    val_accuracy=out["accuracy"], val_miou=out["miou"])

    if args.scan_steps > 0:
        # device-resident pool mode: K steps per dispatch (fastest on
        # TPU; see train/pool.py)
        from .train.pool import DeviceDataPool
        pool = DeviceDataPool.from_feed(feed.batches(), args.pool_size)
        refresh = feed.batches()
        out = None
        while remaining > 0:
            chunk = min(remaining, args.save_every) \
                if args.save_every > 0 else remaining
            out = trainer.train_scanned(
                pool, total_steps=chunk,
                steps_per_dispatch=args.scan_steps,
                refresh_feed=refresh, augment=do_augment)
            remaining -= chunk
            log_metrics(trainer.state.step, loss=out["loss"],
                        accuracy=out["accuracy"],
                        examples_per_sec=out["examples_per_sec"],
                        duty_cycle=out["duty_cycle"])
            if args.eval_records and remaining > 0:
                # scan mode evaluates at dispatch-chunk boundaries
                # (--save-every sized); the final eval happens below
                run_eval(int(trainer.state.step))
            if remaining > 0:  # the final save happens below
                maybe_save()
        if out is not None:
            print(f"final: loss={out['loss']:.4f} "
                  f"acc={out['accuracy']:.4f} "
                  f"imgs/s={out['examples_per_sec']:.1f} "
                  f"duty={out['duty_cycle']:.3f}")
    elif remaining > 0:
        if do_augment:
            import jax
            from .ops.augment import augment_pairs
            from .train.trainer import normalize_images
            akey = jax.random.PRNGKey(cfg.seed)
        with DevicePrefetcher(feed.batches(), trainer.place_batch) as pf:
            it = iter(pf)
            for step in range(remaining):
                images, labels = next(it)
                if do_augment:
                    # on-device augmentation (dihedral ops exact and
                    # label-safe; ops/augment.py), already-placed
                    # batches -- costs no host time. Photometric ops
                    # act in the normalized [0,1] domain, so integer
                    # feeds normalize first (idempotent: the train
                    # step's normalize passes floats through).
                    if (args.augment_invert > 0
                            or args.augment_brightness > 0
                            or args.augment_contrast > 0):
                        images = normalize_images(images)
                    images, labels = augment_pairs(
                        jax.random.fold_in(akey, done_already + step),
                        images, labels,
                        hflip=args.augment, vflip=args.augment,
                        rot90=args.augment,
                        invert_prob=args.augment_invert,
                        brightness=args.augment_brightness,
                        contrast=args.augment_contrast)
                metrics = trainer.train_step(images, labels)
                if step % args.log_every == 0 or step == remaining - 1:
                    stats = trainer.throughput_stats()
                    print(f"step {done_already + step}: "
                          f"loss={metrics['loss']:.4f} "
                          f"acc={metrics['accuracy']:.4f} "
                          f"imgs/s={stats['examples_per_sec']:.1f} "
                          f"duty={stats['duty_cycle']:.3f}")
                    log_metrics(done_already + step,
                                loss=metrics["loss"],
                                accuracy=metrics["accuracy"],
                                examples_per_sec=stats["examples_per_sec"],
                                duty_cycle=stats["duty_cycle"])
                if (args.save_every > 0 and step != remaining - 1
                        and (step + 1) % args.save_every == 0):
                    maybe_save()
                if (args.eval_records and args.eval_every > 0
                        and step != remaining - 1
                        and (step + 1) % args.eval_every == 0):
                    run_eval(done_already + step + 1)
    if manager is not None:
        maybe_save()
    elif args.checkpoint:
        from . import storage as _storage
        trainer.save_checkpoint(
            args.checkpoint if _storage.is_remote(args.checkpoint)
            else os.path.abspath(args.checkpoint))
        print(f"checkpoint saved to {args.checkpoint}")
    if args.eval_records:
        run_eval(int(trainer.state.step))
    if mlog is not None:
        mlog.close()
    return 0


def cmd_predict(args) -> int:
    """Run the model over a chip folder and write georeferenced
    prediction GeoTIFFs (usable as a LocalCatalog product for the
    multi-product stacking flow, reference :472-518)."""
    import numpy as np

    from .raster.geotiff import read_geotiff, write_geotiff
    from .train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(num_classes=args.classes, in_channels=args.channels,
                      base_features=args.features, levels=args.levels,
                      image_size=args.image_size,
                      batch_size=args.batch_size, model=args.model,
                      precision=args.precision,
                      quantize=args.quantize,
                      s2d=args.s2d)
    trainer = Trainer(cfg)
    trainer.restore_checkpoint(args.checkpoint)
    _maybe_calibrate(trainer, args)
    if args.geotiff:
        # whole-raster sliding-window inference: --out is ONE GeoTIFF
        from .pipeline.window import predict_windowed
        if args.stride is not None and not \
                (1 <= args.stride <= args.image_size):
            # same clean rejection the serve path gives (?stride=N ->
            # 400) instead of a raw window_origins traceback
            print(f"--stride must be in [1, --image-size="
                  f"{args.image_size}], got {args.stride}",
                  file=sys.stderr)
            return 2
        g = read_geotiff(args.geotiff)
        from . import storage as _storage
        if not _storage.is_remote(args.out):
            os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                        exist_ok=True)

        last = [-1]

        def _progress(done, total):
            # ~10 lines per run, however many windows a scene has
            decile = done * 10 // total
            if decile != last[0] or done == total:
                last[0] = decile
                print(f"windows {done}/{total}", flush=True)

        out = predict_windowed(trainer, g.array, stride=args.stride,
                               scale=args.scale, probs=args.probs,
                               progress=_progress)
        write_geotiff(args.out,
                      out.astype(np.float32 if args.probs else np.uint8),
                      geotransform=g.info.geotransform,
                      epsg=g.info.epsg, bigtiff="auto")
        print(f"wrote {out.shape[0]}x{out.shape[1]} "
              f"{'probability' if args.probs else 'class'} map to "
              f"{args.out}")
        return 0
    from . import storage as _storage
    _storage.makedirs(args.out, exist_ok=True)
    if args.records:
        return _predict_from_records(args, trainer)
    if not args.images:
        print("predict needs --images DIR, --records GLOB or "
              "--geotiff FILE", file=sys.stderr)
        return 2
    files = _storage.glob(_storage.join(args.images, "*.tif"))
    if not files:
        print(f"no .tif chips in {args.images}")
        return 1
    wrote = 0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i:i + args.batch_size]
        gs = [read_geotiff(f) for f in chunk]
        src = np.stack([g.array for g in gs])
        imgs = src.astype(np.float32)
        # deterministic scaling chosen by --scale; 'auto' = by source
        # dtype, like the feed's _to_float_image for decode modes (a
        # per-batch max heuristic would scale a batch of dark uint16
        # chips by 255, ~257x brighter than at training). Models
        # trained on tifraw or tifarr records (both feed raw DNs:
        # float32 GDAL decode / FloatLists) need --scale none to see
        # the same distribution.
        if args.scale == "auto":
            if src.dtype == np.uint8:
                imgs /= 255.0
            elif src.dtype == np.uint16:
                imgs /= 65535.0
        elif args.scale != "none":
            imgs *= float(args.scale)
        # pad the final batch to the compiled batch size
        n_real = len(chunk)
        if n_real < args.batch_size:
            pad = np.zeros((args.batch_size - n_real,) + imgs.shape[1:],
                           imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        if args.probs:
            # per-class softmax probabilities as a float32 multi-band
            # GeoTIFF (band k = P(class k)) for thresholding /
            # calibration flows where the argmax map loses information
            probs = trainer.predict_probs(imgs)[:n_real]
            for f, g, p in zip(chunk, gs, probs):
                out_path = os.path.join(args.out, os.path.basename(f))
                write_geotiff(out_path, p.astype(np.float32),
                              geotransform=g.info.geotransform,
                              epsg=g.info.epsg)
                wrote += 1
            continue
        preds = trainer.predict(imgs)[:n_real]
        for f, g, p in zip(chunk, gs, preds):
            out_path = os.path.join(args.out, os.path.basename(f))
            write_geotiff(out_path, p.astype(np.uint8),
                          geotransform=g.info.geotransform,
                          epsg=g.info.epsg)
            wrote += 1
    print(f"wrote {wrote} prediction chips to {args.out}")
    return 0



def _maybe_calibrate(trainer, args) -> None:
    """Explicit int8-static calibration from --calibrate-records (a
    shard glob read with the command's --mode/--scale conventions).
    Without it, int8-static auto-calibrates on the first inference
    batch (Trainer._quant_arg)."""
    recs = getattr(args, "calibrate_records", None)
    if trainer.config.quantize != "int8-static" or not recs:
        return
    from .pipeline.input import TFRecordFeed
    # scale="raw": calibration normalizes ON DEVICE through the same
    # normalize_images the inference paths use, so integer feeds see
    # [0,1] and float (raw-DN) feeds pass through -- the scales match
    # what inference will actually quantize
    feed = TFRecordFeed(recs, getattr(args, "mode", "tifarr"),
                        batch_size=trainer.config.batch_size,
                        image_size=trainer.config.image_size,
                        num_workers=2, repeat=False, scale="raw")
    n = trainer.calibrate(feed.batches(),
                          max_batches=args.calibrate_batches)
    print(f"int8-static: calibrated activation scales over {n} "
          f"batch(es) from {recs}")


def cmd_eval(args) -> int:
    """mIoU / accuracy / loss over TFRecord shards with a checkpoint."""
    from .pipeline.input import TFRecordFeed
    from .train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(num_classes=args.classes, in_channels=args.channels,
                      base_features=args.features, levels=args.levels,
                      image_size=args.image_size,
                      batch_size=args.batch_size,
                      label_nodata=args.nodata, model=args.model,
                      precision=args.precision,
                      quantize=args.quantize,
                      s2d=args.s2d)
    trainer = Trainer(cfg)
    trainer.restore_checkpoint(args.checkpoint)
    _maybe_calibrate(trainer, args)
    # source-dtype batches; eval_step normalizes on device (identical
    # numerics to host-side scaling, 4x less copy/transfer for uint8)
    feed = TFRecordFeed(args.records, args.mode,
                        batch_size=args.batch_size,
                        image_size=args.image_size,
                        shuffle_buffer=1, num_workers=args.workers,
                        repeat=False, scale="raw",
                        verify_crc=args.verify_crc)
    out = trainer.evaluate(feed.batches(), max_batches=args.max_batches)
    def _round(v):
        if isinstance(v, float):
            return round(v, 6)
        if isinstance(v, list):
            return [_round(x) for x in v]
        return v

    if args.json:
        print(json.dumps({k: _round(v) for k, v in out.items()}))
    else:
        print(f"eval: loss={out['loss']:.4f} acc={out['accuracy']:.4f} "
              f"miou={out['miou']:.4f} over {out['batches']} batches")
        per = ", ".join(
            f"{k}: iou={'--' if i is None else f'{i:.4f}'} "
            f"f1={'--' if f is None else f'{f:.4f}'}"
            for k, (i, f) in enumerate(zip(out["per_class_iou"],
                                           out["per_class_f1"])))
        print(f"per-class: {per}")
    return 0


def cmd_stitch(args) -> int:
    from .pipeline.stitch import stitch_folder
    n, shape = stitch_folder(args.chips, args.out,
                             fill_value=args.fill)
    print(f"stitched {n} tiles into {args.out} ({shape[0]}x{shape[1]})")
    return 0


def cmd_ingest_safe(args) -> int:
    """Walk Sentinel-2 .SAFE product trees into a LocalCatalog (the
    container-layout leg of the reference's any-GDAL-readable
    ingestion, _img_to_tf_mp.py:45-53 -- the JP2 members already
    decode in-repo)."""
    from .catalog.local import LocalCatalog
    cat = LocalCatalog.create(args.catalog)
    total = 0
    for safe in args.safe:
        n = cat.ingest_safe(safe, product=args.product,
                            cloud_fraction=args.cloud_fraction)
        print(f"{safe}: {n} granule(s) registered")
        total += n
    print(f"registered {total} scene(s) in {args.catalog} "
          f"(product {args.product})")
    return 0 if total else 1


def cmd_push(args) -> int:
    """Push finished shards to a records sink (the reference's WIP
    DL-Storage upload flow, parse nb cells 39-46)."""
    from .records.sink import push_shards, sink_from_dest
    push_shards(args.records, sink_from_dest(args.dest),
                resume=not args.no_resume)
    return 0


def cmd_doctor(args) -> int:
    """Environment self-check: native extension, JAX backend, Pallas
    kernels, codecs -- the preflight for a production deployment."""
    checks = []

    def check(name, fn):
        try:
            detail = fn()
            checks.append((name, True, detail or ""))
        except Exception as e:  # noqa: BLE001 -- report, don't crash
            checks.append((name, False, f"{type(e).__name__}: {e}"))

    def _native_check():
        from . import _native
        assert _native.available(), "build failed (g++ missing?)"
        data = b"doctor" * 1000
        assert _native.lzw_decode(_native.lzw_encode(data),
                                  max_size=len(data)) == data
        return "fastcodec built; LZW + CRC32C ok"

    def _jax_check():
        import jax
        d = jax.devices()
        return f"{len(d)} device(s), backend {jax.default_backend()}"

    def _kernel_check():
        import numpy as np
        from .ops.compositing import masked_median_composite
        from .ops.rasterize import rasterize
        rng = np.random.RandomState(0)
        m, _ = masked_median_composite(
            rng.rand(4, 16, 16, 2).astype(np.float32),
            rng.rand(4, 16, 16) > 0.5)
        ring = np.array([[2.0, 2.0], [12.0, 2.0], [12.0, 12.0],
                         [2.0, 2.0]])
        r = rasterize([([ring], 1.0)], (16, 16), background=0)
        assert r.sum() > 0
        return "median + rasterize kernels execute"

    def _codec_check():
        import numpy as np
        from .raster.geotiff import decode_geotiff, encode_geotiff
        from .raster.image import encode_png, decode_png
        a = (np.arange(96, dtype=np.uint16) % 7).reshape(4, 8, 3)
        assert (decode_geotiff(encode_geotiff(a)).array == a).all()
        p = (a % 5).astype(np.uint8)
        assert (decode_png(encode_png(p)) == p).all()
        return "GeoTIFF + PNG codecs roundtrip"

    def _records_check():
        from .records.example import convert_to_example
        import numpy as np
        img = np.zeros((4, 4, 3), np.uint8)
        rec = convert_to_example(img, img[:, :, 0], 4, 4, 3, 4, 4,
                                 "k").SerializeToString()
        from .records.proto import decode_example
        assert "identifier" in decode_example(rec)
        return "Example codec bit path ok"

    check("native extension", _native_check)
    check("jax devices", _jax_check)
    check("device kernels", _kernel_check)
    check("raster codecs", _codec_check)
    check("record codec", _records_check)
    width = max(len(n) for n, _, _ in checks)
    ok_all = True
    for name, ok, detail in checks:
        status = "OK " if ok else "FAIL"
        ok_all &= ok
        print(f"{status} {name.ljust(width)}  {detail}")
    return 0 if ok_all else 1


def cmd_map(args) -> int:
    """Interactive HTML map of chip-tile footprints + labels (the
    reference's folium notebook maps, create nb cells 30-41)."""
    from .utils.webmap import write_html_map_for_folder
    out = write_html_map_for_folder(args.out, args.chips,
                                    labels=args.labels)
    print(f"wrote {out}")
    return 0


def _predict_from_records(args, trainer) -> int:
    """predict --records: inference straight from TFRecord shards --
    no chip folders needed (the chips may be long deleted after
    translation). Output rasters are named from each record's
    identifier (`:` -> `#`, like the chip writer) and georeferenced by
    reconstructing the geotransform/CRS from tile-key or `name|gt|crs`
    identifiers (geo/georef.py); identifiers without georeferencing
    still produce a plain raster."""
    import numpy as np

    from . import storage as _storage

    from .geo.georef import georef_from_identifier
    from .pipeline.input import PARSE_FNS
    from .raster.geotiff import write_geotiff
    from .records.tfrecord import read_records
    from .serve import scale_image

    parse = PARSE_FNS[args.mode]
    files = _storage.glob(args.records)
    if not files:
        print(f"no shards match {args.records!r}")
        return 1
    wrote = 0
    batch, idents = [], []
    seen: dict = {}

    def flush():
        nonlocal wrote
        if not batch:
            return
        imgs = scale_image(np.stack(batch), args.scale)
        n_real = len(batch)
        if n_real < args.batch_size:
            pad = np.zeros((args.batch_size - n_real,) + imgs.shape[1:],
                           imgs.dtype)
            imgs = np.concatenate([imgs, pad])
        if args.probs:
            out = trainer.predict_probs(imgs)[:n_real].astype(np.float32)
        else:
            out = trainer.predict(imgs)[:n_real].astype(np.uint8)
        for ident, arr in zip(idents, out):
            name = ident.decode("utf-8", errors="replace")
            gt, crs = georef_from_identifier(ident)
            epsg = None
            if crs and crs.upper().startswith("EPSG:"):
                epsg = int(crs.split(":")[1])
            stem = name.replace(":", "#").replace("|", "#")
            # duplicate identifiers (shouldn't happen for tile keys,
            # but records are caller data) get _2, _3, ... suffixes
            # instead of silently overwriting earlier predictions
            k = seen.get(stem, 0) + 1
            seen[stem] = k
            if k > 1:
                stem = f"{stem}_{k}"
            path = os.path.join(args.out, stem + ".tif")
            write_geotiff(path, arr, geotransform=gt, epsg=epsg)
            wrote += 1
        batch.clear()
        idents.clear()

    for f in files:
        for rec in read_records(f, verify_crc=args.verify_crc):
            img, _, ident = parse(rec)
            batch.append(np.asarray(img))
            idents.append(ident)
            if len(batch) == args.batch_size:
                flush()
    flush()
    print(f"wrote {wrote} prediction chips to {args.out}")
    return 0


def cmd_serve(args) -> int:
    """Online inference endpoint: micro-batched, fixed compiled batch
    shape (serve.py). The production-serving layer downstream of
    training -- the reference stops at notebook batch prediction."""
    from .serve import PredictServer, make_http_server
    from .train.trainer import TrainConfig, Trainer

    cfg = TrainConfig(num_classes=args.classes, in_channels=args.channels,
                      base_features=args.features, levels=args.levels,
                      image_size=args.image_size,
                      batch_size=args.batch_size, model=args.model,
                      precision=args.precision,
                      quantize=args.quantize,
                      s2d=args.s2d)
    trainer = Trainer(cfg)
    trainer.restore_checkpoint(args.checkpoint)
    _maybe_calibrate(trainer, args)
    ps = PredictServer(trainer, max_wait_ms=args.max_wait_ms,
                       max_queue=args.max_queue)
    httpd = make_http_server(args.host, args.port, ps, scale=args.scale,
                             max_pixels=args.max_pixels)
    host, port = httpd.server_address[:2]
    # warm the single jit shape so the first request doesn't pay the
    # compile (~40-180 s through the TPU tunnel)
    import numpy as np
    ps.submit(np.zeros((cfg.image_size, cfg.image_size,
                        cfg.in_channels), np.float32), probs=False,
              timeout=600.0)
    print(f"serving {cfg.model} (step {int(trainer.state.step)}) on "
          f"http://{host}:{port}  "
          f"[POST /predict, /predict?probs=1, GET /healthz]")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        ps.close()
    return 0


def cmd_inspect(args) -> int:
    from . import storage
    from .records.tfrecord import read_records

    files = storage.glob(args.records)
    total = 0
    first = None
    for f in files:
        for rec in read_records(f, verify_crc=args.verify_crc):
            if first is None:
                first = rec
            total += 1
    print(f"{len(files)} shards, {total} records")
    if first is not None:
        from .records.proto import decode_example
        d = decode_example(first)
        info = {k: (v.kind,
                    len(v.bytes_list[0]) if v.kind == "bytes"
                    else (v.int64_list if v.kind == "int64"
                          else len(v.float_list)))
                for k, v in sorted(d.items())}
        print(json.dumps({k: str(v) for k, v in info.items()}, indent=2))
        # georeferencing reconstruction from the identifier (the
        # lookup the reference promises but never ships,
        # _tfrecord_image_translation.py:70-74)
        from .geo.georef import georef_from_identifier
        try:
            ident = d["identifier"].bytes_list[0]
            gt, crs = georef_from_identifier(ident)
            name = ident.decode("utf-8", errors="replace")
            if gt is not None:
                print(f"identifier {name} -> geotransform "
                      f"{tuple(round(v, 6) for v in gt)} crs {crs}")
            else:
                print(f"identifier {name!r} (no georeferencing)")
        except Exception:  # foreign TFRecords without our schema
            pass
    if args.preview:
        # the parse notebook's visual QA (image | label side by side,
        # cells 14-37) as a PNG contact sheet artifact
        from .pipeline.input import PARSE_FNS
        from .raster.image import encode_png
        from .utils.preview import render_pair_sheet
        parse = PARSE_FNS[args.mode]
        pairs = []
        for f in files:
            for rec in read_records(f, verify_crc=args.verify_crc):
                out = parse(rec)
                pairs.append((out[0], out[1]))
                if len(pairs) >= args.preview_count:
                    break
            if len(pairs) >= args.preview_count:
                break
        bands = (tuple(int(b) for b in args.rgb_bands.split(","))
                 if args.rgb_bands else None)
        sheet = render_pair_sheet(pairs, rgb_bands=bands,
                                  nodata=args.nodata)
        with open(args.preview, "wb") as fh:
            fh.write(encode_png(sheet))
        print(f"wrote {len(pairs)}-pair preview sheet to {args.preview} "
              f"({sheet.shape[0]}x{sheet.shape[1]})")
    if args.class_stats:
        # label-pixel histogram over the whole dataset + suggested
        # inverse-frequency --class-weights (normalized so the most
        # common class has weight 1); nodata excluded
        import numpy as np
        from .pipeline.input import PARSE_FNS
        parse = PARSE_FNS[args.mode]
        counts: dict = {}
        for f in files:
            for rec in read_records(f, verify_crc=args.verify_crc):
                target = parse(rec)[1]  # (img, target[, identifier])
                v, c = np.unique(np.asarray(target, np.int64),
                                 return_counts=True)
                for vi, ci in zip(v.tolist(), c.tolist()):
                    counts[vi] = counts.get(vi, 0) + ci
        valid = {k: v for k, v in counts.items() if k != args.nodata}
        tot = sum(valid.values())
        print(f"label pixels: {tot} valid"
              + (f", {counts.get(args.nodata, 0)} nodata"
                 if args.nodata in counts else ""))
        for k in sorted(valid):
            print(f"  class {k}: {valid[k]} ({valid[k] / tot:.2%})")
        if valid and min(valid.values()) > 0:
            ref = max(valid.values())
            weights = {k: ref / valid[k] for k in sorted(valid)}
            print("suggested --class-weights "
                  + ",".join(f"{weights[k]:.3g}" for k in sorted(valid)))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="dlseg-tpu",
                                description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create-chips", help="AOI -> GeoTIFF chip pairs")
    c.add_argument("--labels", required=True)
    c.add_argument("--layer", default=0)
    c.add_argument("--attribute", default=None)
    c.add_argument("--product", required=True)
    c.add_argument("--bands", default="red green blue")
    c.add_argument("--tile-size", type=int, default=256)
    c.add_argument("--pad", type=int, default=2)
    c.add_argument("--resolution", type=float, default=10.0)
    c.add_argument("--out", required=True)
    c.add_argument("--tag", default="export")
    c.add_argument("--loc", default="aoi")
    c.add_argument("--year", default=str(_dt.date.today().year))
    c.add_argument("--ref-date", type=_date,
                   default=_dt.date.today().isoformat())
    c.add_argument("--min-date", type=_date, default=None)
    c.add_argument("--max-date", type=_date, default=None)
    c.add_argument("--max-cloud-fraction", type=float, default=None)
    c.add_argument("--nodata", type=int, default=255)
    c.add_argument("--catalog", required=True,
                   help="local catalog root, 'synthetic', an "
                        "http(s):// scene-server base URL, or a "
                        "stac+http(s):// STAC endpoint (static "
                        "catalog.json tree or item-search API)")
    c.add_argument("--processing-level", default="surface",
                   help="asset level requested from an HTTP catalog "
                        "(reference requests surface reflectance, "
                        "_descartes_img_chips.py:617-627); scenes "
                        "without an assets map serve every level. On "
                        "a STAC catalog this filters the items' "
                        "processing:level property instead (e.g. "
                        "L2A); the default 'surface' maps to "
                        "no filter there")
    c.add_argument("--workers", type=int, default=8)
    c.add_argument("--batch-tiles", type=int, default=16,
                   help="composite+burn K tiles per device dispatch "
                        "(0 = per-tile); byte-identical outputs, ~4x "
                        "faster on TPU")
    c.add_argument("--low-priority", action="store_true",
                   help="renice the export so it doesn't starve the "
                        "machine (notebook cell 78 behavior)")
    c.add_argument("--max-attempts", type=int, default=20)
    c.set_defaults(fn=cmd_create_chips)

    t = sub.add_parser("to-tfrecords", help="chip folder -> TFRecords")
    t.add_argument("--name", required=True)
    t.add_argument("--directory", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--shards", type=int, default=12)
    t.add_argument("--workers", type=int, default=None)
    t.add_argument("--engine", choices=["mt", "mp"], default="mp")
    t.add_argument("--file-ext", default="tif")
    t.add_argument("--store-as-array", action="store_true")
    t.add_argument("--png-to-jpg", action="store_true")
    t.add_argument("--no-dltile-names", action="store_true")
    t.add_argument("--resume", action="store_true",
                   help="skip shard files that already exist (atomic "
                        "writes make existence mean complete)")
    t.set_defaults(fn=cmd_to_tfrecords)

    cv = sub.add_parser(
        "convert", help="GeoTIFF chip folder -> PNG/JPG chip folder "
                        "(feeds the MT engine; translate nb cells 6-8)")
    cv.add_argument("--directory", required=True,
                    help="chip folder with images/ + labels/ subfolders")
    cv.add_argument("--out", required=True)
    cv.add_argument("--file-ext", default="tif")
    cv.add_argument("--to", choices=["png", "jpg"], default="png")
    cv.add_argument("--workers", type=int, default=8)
    cv.add_argument("--quality", type=int, default=100,
                    help="JPEG quality (--to jpg)")
    cv.add_argument("--rescale", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="linearly map imagery [LO, HI] -> uint8 "
                         "(labels pass through unchanged)")
    cv.add_argument("--rescale-labels", action="store_true",
                    help="apply --rescale to labels too (labels are "
                         "class ids; normally leave off)")
    cv.set_defaults(fn=cmd_convert)

    tr = sub.add_parser("train", help="TFRecords -> U-Net training")
    tr.add_argument("--records", required=True, help="shard glob")
    tr.add_argument("--mode", default="rgbraw",
                    choices=["rgbraw", "rgbarr", "tifraw", "tifarr"])
    tr.add_argument("--model", default="unet",
                choices=["unet", "deeplab", "segformer"])
    tr.add_argument("--classes", type=int, default=2)
    tr.add_argument("--channels", type=int, default=3)
    tr.add_argument("--features", type=int, default=32)
    tr.add_argument("--levels", type=int, default=4)
    tr.add_argument("--image-size", type=int, default=256)
    tr.add_argument("--batch-size", type=int, default=32)
    tr.add_argument("--lr", type=float, default=1e-3)
    tr.add_argument("--weight-decay", type=float, default=1e-4)
    tr.add_argument("--schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="learning-rate schedule; cosine decays over "
                         "--steps with a linear --warmup-steps ramp")
    tr.add_argument("--warmup-steps", type=int, default=0)
    tr.add_argument("--grad-clip-norm", type=float, default=0.0,
                    help="global-norm gradient clipping (0 = off)")
    tr.add_argument("--class-weights", default=None,
                    help="comma-separated per-class loss weights for "
                         "imbalanced data, e.g. '1,5' to upweight the "
                         "rare class (one weight per class)")
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--steps", type=int, default=100)
    tr.add_argument("--nodata", type=int, default=255)
    tr.add_argument("--n-model", type=int, default=1)
    tr.add_argument("--spatial", action="store_true",
                    help="shard image height over the model axis "
                         "(GSPMD spatially-partitioned convs) instead "
                         "of conv channels")
    tr.add_argument("--fsdp", action="store_true",
                    help="store large conv kernels + optimizer moments "
                         "sharded over the data axis (ZeRO-3: XLA "
                         "all-gathers params at use, reduce-scatters "
                         "grads; ~n_data-fold less param/opt HBM per "
                         "device)")
    tr.add_argument("--s2d", type=int, default=0,
                    help="space-to-depth block (unet only): run every "
                         "conv at 1/s2d the spatial size with pixels "
                         "folded into channels + a sub-pixel logits "
                         "head. Fixes the measured MXU lane-padding "
                         "tax on small-channel 256^2 convs (HBM-bound "
                         "shapes). Default 0 = AUTO: the equal-FLOPs "
                         "s2d=2 packing at narrow HBM-bound shapes "
                         "(features<=48, image>=128; 1.39x measured), "
                         "classic tree elsewhere; restore detects a "
                         "checkpoint of the other variant and adapts. "
                         "1 forces classic; >1 is the explicit "
                         "round-3 tree (features taken as-is)")
    tr.add_argument("--remat", action="store_true",
                    help="rematerialise activations in the backward "
                         "pass (more FLOPs, much less HBM)")
    tr.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"],
                    help="compute precision: bf16 conv/matmul compute "
                         "with fp32 params+optimizer (MXU-native, "
                         "default) or fp32 everywhere; checkpoints are "
                         "interchangeable between the two")
    tr.add_argument("--scan-steps", type=int, default=0,
                    help="steps per dispatch via a device-resident pool "
                         "(0 = classic per-step feed)")
    tr.add_argument("--pool-size", type=int, default=1024)
    tr.add_argument("--shuffle-buffer", type=int, default=256)
    tr.add_argument("--workers", type=int, default=4)
    tr.add_argument("--log-every", type=int, default=10)
    tr.add_argument("--checkpoint", default=None,
                    help="checkpoint path; with --save-every this is a "
                         "managed rotating-checkpoint DIRECTORY")
    tr.add_argument("--save-every", type=int, default=0,
                    help="save a managed rotating checkpoint every N "
                         "steps into --checkpoint and auto-resume the "
                         "latest one on restart (--steps is the run's "
                         "total budget); 0 = single save at the end")
    tr.add_argument("--keep", type=int, default=3,
                    help="managed checkpoints kept (with --save-every)")
    tr.add_argument("--restore", default=None,
                    help="fine-tune from a single saved checkpoint "
                         "(always runs the full --steps; the step "
                         "counter continues from the checkpoint)")
    tr.add_argument("--eval-records", default=None,
                    help="validation TFRecord glob: evaluated every "
                         "--eval-every steps (per-step mode) or at "
                         "dispatch-chunk boundaries (--scan-steps "
                         "mode), plus once after training; prints "
                         "dataset-level val loss/acc/mIoU and logs "
                         "val_* lines to --metrics-log")
    tr.add_argument("--eval-every", type=int, default=0,
                    help="validation cadence in steps (per-step mode; "
                         "0 = only the final eval). Eval time counts "
                         "against the printed duty/imgs-per-sec")
    tr.add_argument("--eval-max-batches", type=int, default=None,
                    help="cap validation batches per eval pass")
    tr.add_argument("--metrics-log", default=None,
                    help="append one JSON line per logged step "
                         "({step, loss, accuracy, examples_per_sec, "
                         "duty_cycle}) to this file for run monitoring "
                         "(tail -f / jq); resumes append to the same "
                         "file")
    tr.add_argument("--verify-crc", action="store_true",
                    help="validate TFRecord frame CRCs while feeding "
                         "(array modes would otherwise accept corrupt "
                         "payloads that reshape cleanly)")
    tr.add_argument("--augment", action="store_true",
                    help="on-device random dihedral augmentation "
                         "(flips + 90-degree rotations, applied "
                         "identically to image and label; exact and "
                         "label-safe -- ops/augment.py)")
    tr.add_argument("--augment-invert", type=float, default=0.0,
                    metavar="P",
                    help="probability of per-example intensity "
                         "inversion (image only, labels untouched; "
                         "the reference's RandomInvert sketch). "
                         "Assumes a [0,1]-normalized feed (any "
                         "integer-dtype storage mode)")
    tr.add_argument("--augment-brightness", type=float, default=0.0,
                    metavar="B",
                    help="per-example additive brightness jitter "
                         "~ U(-B, +B) on the [0,1] scale, clipped "
                         "(image only)")
    tr.add_argument("--augment-contrast", type=float, default=0.0,
                    metavar="C",
                    help="per-example contrast jitter around the "
                         "per-channel mean, factor ~ U(1-C, 1+C) "
                         "(image only; scale-invariant, safe for "
                         "raw-DN tifarr feeds)")
    tr.set_defaults(fn=cmd_train)

    pr = sub.add_parser("predict", help="chips -> prediction GeoTIFFs")
    pr.add_argument("--images", default=None,
                    help="folder of .tif chips (an /images folder)")
    pr.add_argument("--records", default=None,
                    help="predict straight from TFRecord shards "
                         "instead of chip folders (glob); outputs are "
                         "named and georeferenced from each record's "
                         "identifier")
    pr.add_argument("--geotiff", default=None,
                    help="sliding-window inference over ONE large "
                         "georeferenced raster (no re-tiling needed): "
                         "windows of --image-size step by --stride, "
                         "overlaps blend by averaging softmax "
                         "probabilities, and --out is the single "
                         "output GeoTIFF path")
    pr.add_argument("--stride", type=int, default=None,
                    help="--geotiff window step in pixels (default: "
                         "image size, i.e. overlap only at the "
                         "clamped edges; image_size//2 blends seams "
                         "everywhere)")
    pr.add_argument("--mode", default="tifarr",
                    choices=["rgbraw", "rgbarr", "tifraw",
                             "tifraw_eager", "tifarr"],
                    help="storage mode for --records parsing")
    pr.add_argument("--verify-crc", action="store_true",
                    help="validate TFRecord frame CRCs (--records)")
    pr.add_argument("--checkpoint", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--classes", type=int, default=2)
    pr.add_argument("--channels", type=int, default=3)
    pr.add_argument("--features", type=int, default=32)
    pr.add_argument("--levels", type=int, default=4)
    pr.add_argument("--image-size", type=int, default=256)
    pr.add_argument("--batch-size", type=int, default=8)
    pr.add_argument("--model", default="unet",
                    choices=["unet", "deeplab", "segformer"])
    pr.add_argument("--s2d", type=int, default=0,
                    help="space-to-depth block (unet only); default "
                         "0 = auto (matches the train default and "
                         "auto-detects the checkpoint's variant on "
                         "restore); set explicitly only to pin a "
                         "non-default tree")
    pr.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int8-static"],
                    help="int8 = s8 MXU convolutions with dynamic "
                         "activation scales; int8-static = calibrated "
                         "CONSTANT activation scales (no per-layer "
                         "reduction passes -- the narrow-width "
                         "variant; auto-calibrates on the first "
                         "batch, or pass --calibrate-records). Float "
                         "checkpoints load unchanged (unet only). "
                         "Dynamic pays off on "
                         "compute-bound (wide) models: 1.31x at "
                         "bf=128 on v5e, but a net LOSS at narrow "
                         "HBM-bound widths (0.59x at bf=32) -- see "
                         "models/quant.py")
    pr.add_argument("--calibrate-records", default=None,
                    help="int8-static: shard glob to calibrate "
                         "activation scales from; default = "
                         "auto-calibrate on the first inference batch")
    pr.add_argument("--calibrate-batches", type=int, default=8,
                    help="batches consumed from --calibrate-records")
    pr.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"],
                    help="compute precision; match the checkpoint's "
                         "training run for identical numerics "
                         "(checkpoints themselves are fp32 either way)")
    pr.add_argument("--probs", action="store_true",
                    help="write per-class softmax probabilities as "
                         "float32 multi-band GeoTIFFs (band k = "
                         "P(class k)) instead of uint8 argmax maps")
    pr.add_argument("--scale", default="auto",
                    help="input scaling, matching how the checkpoint "
                         "was TRAINED: 'auto' = by chip dtype "
                         "(uint8/255, uint16/65535 -- matches rgbraw/"
                         "rgbarr training), 'none' = raw values "
                         "(matches tifraw AND tifarr training: both "
                         "feed raw DNs -- the GDAL-wrapped parser "
                         "decodes to float32 digital numbers and "
                         "FloatList records store them unscaled), or "
                         "a float multiplier")
    pr.set_defaults(fn=cmd_predict)

    sv = sub.add_parser("serve", help="online inference HTTP endpoint")
    sv.add_argument("--checkpoint", required=True)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8531)
    sv.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="batch window: the first queued request waits "
                         "at most this long for others to share its "
                         "device dispatch (bounds latency; a full "
                         "batch closes the window early)")
    sv.add_argument("--max-queue", type=int, default=0,
                    help="admission bound: requests beyond this many "
                         "queued are answered 503 immediately "
                         "(0 = 8 batches' worth)")
    sv.add_argument("--max-pixels", type=int, default=16_000_000,
                    help="largest whole-raster request (H*W) the "
                         "sliding-window path accepts; bigger bodies "
                         "are answered 413 (the host holds a float32 "
                         "probability accumulation per raster)")
    sv.add_argument("--classes", type=int, default=2)
    sv.add_argument("--channels", type=int, default=3)
    sv.add_argument("--features", type=int, default=32)
    sv.add_argument("--levels", type=int, default=4)
    sv.add_argument("--image-size", type=int, default=256)
    sv.add_argument("--batch-size", type=int, default=8)
    sv.add_argument("--model", default="unet",
                    choices=["unet", "deeplab", "segformer"])
    sv.add_argument("--s2d", type=int, default=0,
                    help="space-to-depth block (unet only); default "
                         "0 = auto (matches the train default and "
                         "auto-detects the checkpoint's variant on "
                         "restore); set explicitly only to pin a "
                         "non-default tree")
    sv.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int8-static"],
                    help="int8 = s8 MXU convolutions with dynamic "
                         "activation scales; int8-static = calibrated "
                         "CONSTANT activation scales (no per-layer "
                         "reduction passes -- the narrow-width "
                         "variant; auto-calibrates on the first "
                         "batch, or pass --calibrate-records). Float "
                         "checkpoints load unchanged (unet only). "
                         "Dynamic pays off on "
                         "compute-bound (wide) models: 1.31x at "
                         "bf=128 on v5e, but a net LOSS at narrow "
                         "HBM-bound widths (0.59x at bf=32) -- see "
                         "models/quant.py")
    sv.add_argument("--calibrate-records", default=None,
                    help="int8-static: shard glob to calibrate "
                         "activation scales from; default = "
                         "auto-calibrate on the first inference batch")
    sv.add_argument("--calibrate-batches", type=int, default=8,
                    help="batches consumed from --calibrate-records")
    sv.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"])
    sv.add_argument("--scale", default="auto",
                    help="scaling applied to ENCODED request bodies "
                         "(PNG/JPG/GeoTIFF), same rules as predict "
                         "--scale; .npy bodies are taken as-is")
    sv.set_defaults(fn=cmd_serve)

    ev = sub.add_parser("eval", help="evaluate a checkpoint on shards")
    ev.add_argument("--records", required=True)
    ev.add_argument("--checkpoint", required=True)
    ev.add_argument("--mode", default="tifarr",
                    choices=["rgbraw", "rgbarr", "tifraw", "tifarr"])
    ev.add_argument("--model", default="unet",
                    choices=["unet", "deeplab", "segformer"])
    ev.add_argument("--classes", type=int, default=2)
    ev.add_argument("--channels", type=int, default=3)
    ev.add_argument("--features", type=int, default=32)
    ev.add_argument("--levels", type=int, default=4)
    ev.add_argument("--image-size", type=int, default=256)
    ev.add_argument("--batch-size", type=int, default=8)
    ev.add_argument("--nodata", type=int, default=255)
    ev.add_argument("--workers", type=int, default=2)
    ev.add_argument("--max-batches", type=int, default=None)
    ev.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON line instead "
                         "of the human summary (for CI gates)")
    ev.add_argument("--verify-crc", action="store_true",
                    help="validate TFRecord frame CRCs while feeding "
                         "(array modes would otherwise accept corrupt "
                         "payloads that reshape cleanly)")
    ev.add_argument("--s2d", type=int, default=0,
                    help="space-to-depth block (unet only); default "
                         "0 = auto (matches the train default and "
                         "auto-detects the checkpoint's variant on "
                         "restore); set explicitly only to pin a "
                         "non-default tree")
    ev.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int8-static"],
                    help="int8 = s8 MXU convolutions with dynamic "
                         "activation scales; int8-static = calibrated "
                         "CONSTANT activation scales (no per-layer "
                         "reduction passes -- the narrow-width "
                         "variant; auto-calibrates on the first "
                         "batch, or pass --calibrate-records). Float "
                         "checkpoints load unchanged (unet only). "
                         "Dynamic pays off on "
                         "compute-bound (wide) models: 1.31x at "
                         "bf=128 on v5e, but a net LOSS at narrow "
                         "HBM-bound widths (0.59x at bf=32) -- see "
                         "models/quant.py")
    ev.add_argument("--calibrate-records", default=None,
                    help="int8-static: shard glob to calibrate "
                         "activation scales from; default = "
                         "auto-calibrate on the first inference batch")
    ev.add_argument("--calibrate-batches", type=int, default=8,
                    help="batches consumed from --calibrate-records")
    ev.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"],
                    help="compute precision; match the checkpoint's "
                         "training run for identical numerics")
    ev.set_defaults(fn=cmd_eval)

    stp = sub.add_parser("stitch", help="chips -> one GeoTIFF mosaic")
    stp.add_argument("--chips", required=True,
                     help="folder of tile-key-named .tif chips")
    stp.add_argument("--out", required=True)
    stp.add_argument("--fill", type=float, default=0)
    stp.set_defaults(fn=cmd_stitch)

    ing = sub.add_parser(
        "ingest-safe",
        help="Sentinel-2 .SAFE tree -> catalog scenes")
    ing.add_argument("--catalog", required=True,
                     help="LocalCatalog root (created if missing)")
    ing.add_argument("--safe", required=True, nargs="+",
                     help="one or more .SAFE product directories")
    ing.add_argument("--product", default="sentinel-2:L1C")
    ing.add_argument("--cloud-fraction", type=float, default=None,
                     help="recorded per-scene cloud fraction (ESA "
                          "metadata is not parsed; pass the value "
                          "when known)")
    ing.set_defaults(fn=cmd_ingest_safe)

    pu = sub.add_parser("push", help="shards -> records sink (dir or "
                                     "signed-URL manifest)")
    pu.add_argument("--records", required=True, help="shard glob")
    pu.add_argument("--dest", required=True,
                    help="destination dir, or .json of {shard: signed URL}")
    pu.add_argument("--no-resume", action="store_true",
                    help="re-push shards the sink already has")
    pu.set_defaults(fn=cmd_push)

    doc = sub.add_parser("doctor", help="environment self-check")
    doc.set_defaults(fn=cmd_doctor)

    m = sub.add_parser("map", help="chips -> interactive HTML map")
    m.add_argument("--chips", required=True,
                   help="folder of tile-key-named chips (e.g. .../images)")
    m.add_argument("--labels", default=None,
                   help="optional vector label dataset to overlay")
    m.add_argument("--out", default="map.html")
    m.set_defaults(fn=cmd_map)

    i = sub.add_parser("inspect", help="summarize TFRecord shards")
    i.add_argument("--records", required=True)
    i.add_argument("--verify-crc", action="store_true")
    i.add_argument("--class-stats", action="store_true",
                   help="scan every record's label raster and print "
                        "per-class pixel counts plus a suggested "
                        "inverse-frequency --class-weights string "
                        "(most common class = 1)")
    i.add_argument("--mode", default="tifarr",
                   choices=["rgbraw", "rgbarr", "tifraw",
                            "tifraw_eager", "tifarr"],
                   help="storage mode for --class-stats parsing")
    i.add_argument("--nodata", type=int, default=255,
                   help="label value excluded from --class-stats and "
                        "blacked out in --preview")
    i.add_argument("--preview", default=None,
                   help="write an (image | label) PNG contact sheet of "
                        "the first records -- the parse notebook's "
                        "visual QA as a file artifact")
    i.add_argument("--preview-count", type=int, default=4,
                   help="record pairs on the --preview sheet")
    i.add_argument("--rgb-bands", default=None,
                   help="comma-separated band indices shown as R,G,B "
                        "in --preview (default: 3,2,1 for >3-band "
                        "stacks like Sentinel-2, else 0,1,2); each "
                        "band display-normalized by its tile max")
    i.set_defaults(fn=cmd_inspect)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

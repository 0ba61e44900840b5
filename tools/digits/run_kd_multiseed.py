"""Real-data KD head-to-head: both stacks, multi-seed (VERDICT r4 #3).

KD is the accuracy mechanism of every flagship recipe (reference
tasks.py:33-82, kd_criterion.py:12-52), yet the digits ladder covered
only the six KD-free recipes. This harness trains, per seed and per
STACK (quant_tpu via the real CLI; the torch reference via its own
classification_task on the same exported idx files):

  1. an fp LeNet teacher (the stock mnist_fp recipe);
  2. a `ls-1` KD student and a `ls-1-weight x ls-2-activation` KD
     student, with the published KD settings — temperature 5,
     teacher_correction true, freeze_teacher, train_mode
     (cifar100_ls1_weight_ls2_activation_kd.yaml:62-69) — pointing at
     that stack's own seed-matched teacher.

This exercises teacher restore, get_teacher_apply and train/kd.py
end-to-end on real images for the first time. Reports per-recipe
mean +- std and the PAIRED quant_tpu - reference delta with a t-based
95% CI; writes results/MULTISEED_KD.csv and maintains a
'KD head-to-head' section inside results/MULTISEED.md.

Usage: python tools/digits/run_kd_multiseed.py [n_seeds]   (~1 h CPU)
"""

import csv
import os
import pathlib
import shutil
import subprocess
import sys

import yaml

REPO = pathlib.Path(__file__).resolve().parents[2]
DATA = '/tmp/digits_mnist'
RUNS = pathlib.Path('/tmp/digits_kd_runs')
REF_RUNS = RUNS / 'ref'
RESULTS = REPO / 'tools' / 'digits' / 'results'
EPOCHS = 30
_T975 = {2: 12.706, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571}
_KD_MARK = '<!-- KD-SECTION (run_kd_multiseed.py) -->'

# Published KD settings (reference cifar100_..._kd.yaml:62-69).
_CRIT = {'temperature': 5, 'teacher_correction': True}

_STUDENTS = ['mnist_ls1', 'mnist_ls1_weight_ls2_activation']


def _max_checkpoint(ckpt_dir: pathlib.Path) -> pathlib.Path:
    cands = sorted(ckpt_dir.glob('checkpoint_*'),
                   key=lambda p: int(p.name.split('_')[1].split('.')[0]))
    if not cands:
        raise FileNotFoundError(f'no checkpoints under {ckpt_dir}')
    return cands[-1]


def _tpu_run(src: pathlib.Path, seed: int, env: dict, name: str,
             kd_config=None) -> float:
    cfg = yaml.safe_load(src.read_text())
    cfg['seed'] = seed
    cfg['data']['dataset_path'] = DATA + '/'
    cfg['data']['test_batch_size'] = 360
    cfg['optimization']['epochs'] = EPOCHS
    cfg['log']['root_experiments_dir'] = str(RUNS) + '/'
    cfg['log']['tensorboard'] = False
    cfg['log']['save_model_freq'] = EPOCHS
    if kd_config:
        cfg['model']['kd_config'] = kd_config
    run_dir = RUNS / name
    cfg_path = RUNS / f'{name}.yaml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    log = RUNS / f'{name}.log'
    for attempt in (1, 2):  # retry once: transient failures under load
        shutil.rmtree(run_dir, ignore_errors=True)
        with open(log, 'w') as lf:
            rc = subprocess.run(
                [sys.executable, str(REPO / 'examples/mnist/mnist.py'),
                 '--config', str(cfg_path), '--experiment-name', name],
                env=env, stdout=lf, stderr=subprocess.STDOUT).returncode
        if rc == 0:
            break
        print(f'    attempt {attempt} rc={rc}; tail of {log}:',
              flush=True)
        print('\n'.join(log.read_text().splitlines()[-5:]), flush=True)
    else:
        raise RuntimeError(f'{name} failed twice; see {log}')
    last = (run_dir / 'metrics' / 'test.csv').read_text() \
        .strip().splitlines()[-1].split(',')
    return float(last[1])


def _ref_run(src: pathlib.Path, seed: int, name: str,
             kd_config=None) -> float:
    import run_reference as rr
    cfg = rr.patched_config(src)
    cfg['optimization']['epochs'] = EPOCHS  # pin (rr has its own const)
    cfg['seed'] = seed
    cfg['experiment_name'] = name
    if kd_config:
        cfg['model']['kd_config'] = kd_config
    exp_dir = REF_RUNS / name
    shutil.rmtree(exp_dir, ignore_errors=True)
    exp_dir.mkdir(parents=True, exist_ok=True)
    # classification_task does not write the resolved config (that is
    # Experiment's job in the reference); the teacher loader needs it.
    (exp_dir / 'config.yaml').write_text(yaml.safe_dump(cfg))
    _, test_epochs = rr.classification_task(
        cfg, REF_RUNS, rr.DigitsRefDataLoader, lambda *a: ([], []), None)
    return float(test_epochs[-1]['Top-1 Accuracy'])


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    RUNS.mkdir(parents=True, exist_ok=True)
    REF_RUNS.mkdir(parents=True, exist_ok=True)
    subprocess.run([sys.executable,
                    str(REPO / 'tools/digits/export_digits.py'), DATA],
                   check=True, env=env)
    sys.path.insert(0, str(REPO / 'tools' / 'digits'))
    import torch
    torch.set_num_threads(2)

    mnist = REPO / 'examples' / 'mnist'
    ref_mnist = pathlib.Path('/root/reference/examples/mnist')

    # Resume support: completed (recipe, seed) rows are kept and their
    # runs skipped (teacher artifacts in RUNS persist across restarts).
    grid: list[dict] = []
    csv_path = RESULTS / 'MULTISEED_KD.csv'
    if csv_path.exists():
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                grid.append({'recipe': row['recipe'],
                             'seed': int(row['seed']),
                             'quant_tpu': float(row['quant_tpu']),
                             'reference': float(row['reference'])})
        print(f'resuming: {len(grid)} rows already done', flush=True)

    def have(recipe: str, seed: int) -> bool:
        return any(g['recipe'] == recipe and g['seed'] == seed
                   for g in grid)

    for seed in range(n_seeds):
        # --- teachers (fp recipe), one per stack per seed ---
        tname = f'kd_teacher_s{seed}'
        teachers_exist = ((RUNS / tname / 'checkpoints').exists()
                          and (REF_RUNS / tname / 'checkpoints').exists())
        if not (have('teacher_fp', seed) and teachers_exist):
            print(f'=== seed {seed} teacher (fp)', flush=True)
            q_t = _tpu_run(mnist / 'mnist_fp.yaml', seed, env, tname)
            r_t = _ref_run(ref_mnist / 'mnist_fp.yaml', seed, tname)
            grid = [g for g in grid
                    if not (g['recipe'] == 'teacher_fp'
                            and g['seed'] == seed)]
            grid.append({'recipe': 'teacher_fp', 'seed': seed,
                         'quant_tpu': q_t, 'reference': r_t})
            print(f'    quant_tpu {q_t * 100:.2f}  '
                  f'reference {r_t * 100:.2f}', flush=True)

        tpu_kd = {
            'teacher_config_path': str(RUNS / tname / 'config.yaml'),
            'teacher_checkpoint_path': str(
                _max_checkpoint(RUNS / tname / 'checkpoints')),
            'freeze_teacher': True, 'train_mode': True,
            'criterion_config': dict(_CRIT),
        }
        ref_kd = {
            'teacher_config_path': str(REF_RUNS / tname / 'config.yaml'),
            'teacher_checkpoint_path': str(
                _max_checkpoint(REF_RUNS / tname / 'checkpoints')),
            'freeze_teacher': True, 'train_mode': True,
            'criterion_config': dict(_CRIT),
        }

        # --- KD students ---
        for stem in _STUDENTS:
            if have(f'{stem}_kd', seed):
                continue
            name = f'kd_{stem}_s{seed}'
            print(f'=== seed {seed} {stem} + KD', flush=True)
            q = _tpu_run(mnist / f'{stem}.yaml', seed, env, name,
                         kd_config=tpu_kd)
            r = _ref_run(ref_mnist / f'{stem}.yaml', seed, name,
                         kd_config=ref_kd)
            grid.append({'recipe': f'{stem}_kd', 'seed': seed,
                         'quant_tpu': q, 'reference': r})
            print(f'    quant_tpu {q * 100:.2f}  '
                  f'reference {r * 100:.2f}', flush=True)
            with open(RESULTS / 'MULTISEED_KD.csv', 'w', newline='') as f:
                w = csv.DictWriter(f, ['recipe', 'seed', 'quant_tpu',
                                       'reference'])
                w.writeheader()
                w.writerows(grid)
            _write_kd_section(grid, n_seeds)


def _write_kd_section(grid: list, n_seeds: int) -> None:
    import numpy as np
    recipes = sorted({g['recipe'] for g in grid})
    lines = [
        _KD_MARK,
        '',
        '## KD head-to-head (run_kd_multiseed.py)',
        '',
        f'{n_seeds} seeds; per seed and per STACK an fp teacher '
        '(mnist_fp) is trained,',
        'then KD students with the published settings (T=5,',
        'teacher_correction=true, freeze_teacher, train_mode —',
        'cifar100_ls1_weight_ls2_activation_kd.yaml:62-69) against that',
        "stack's own teacher. Same data/protocol as the table above.",
        '',
        '| recipe | n | reference top-1 | quant_tpu top-1 '
        '| paired delta | 95% CI |',
        '|---|---|---|---|---|---|']
    for rec in recipes:
        rows = [g for g in grid if g['recipe'] == rec]
        q = np.array([g['quant_tpu'] for g in rows]) * 100
        r = np.array([g['reference'] for g in rows]) * 100
        d = q - r
        n = len(rows)
        if n >= 2:
            half = _T975.get(n, 2.0) * d.std(ddof=1) / np.sqrt(n)
            ci = f'[{d.mean() - half:+.2f}, {d.mean() + half:+.2f}]'
        else:
            ci = 'n/a'
        sd_r = r.std(ddof=1) if n > 1 else 0
        sd_q = q.std(ddof=1) if n > 1 else 0
        lines.append(
            f'| {rec} | {n} | {r.mean():.2f} +- {sd_r:.2f} '
            f'| {q.mean():.2f} +- {sd_q:.2f} '
            f'| {d.mean():+.2f} | {ci} |')
    lines += ['', 'Raw grid: MULTISEED_KD.csv.', '']
    section = '\n'.join(lines)

    md = RESULTS / 'MULTISEED.md'
    text = md.read_text() if md.exists() else ''
    if _KD_MARK in text:
        text = text[:text.index(_KD_MARK)].rstrip() + '\n\n' + section
    else:
        text = text.rstrip() + '\n\n' + section
    md.write_text(text)


if __name__ == '__main__':
    main()

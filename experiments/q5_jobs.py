import sys
sys.path.insert(0, "/root/repo")
from ezbake_graph_spark import registry
from ezbake_graph_spark.session import get_session
spark = get_session("q5jobs")
SF = "/root/testdata/sf0.001"
fn = registry.queries()["join_star_q5"]
fn(spark, SF).collect()
st = spark.sparkContext.statusTracker()
before = set(st.getJobIdsForGroup(None))
fn(spark, SF).collect()
jobs = [j for j in st.getJobIdsForGroup(None) if j not in before]
print("jobs:", sorted(jobs))
for j in sorted(jobs):
    ji = st.getJobInfo(j)
    print(j, ji.stageIds)
df = fn(spark, SF)
df.collect()
print(df._jdf.queryExecution().executedPlan().toString()[:3000])
